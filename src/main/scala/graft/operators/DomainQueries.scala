package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Normalizers, TypeNormalize}
import graft.sources.Tables

/** Rialto domain operators instantiated on the synthetic tables
  * (SURVEY.md §2 #14-18, #20-26, #28, #30 and §3 for the role mapping:
  * orders ≈ publications, supplier-via-lineitem ≈ authors association,
  * part-via-lineitem ≈ funders association).
  */
object DomainQueries {
  type Q = (SparkSession, String) => DataFrame

  private val CurrentYear = 2026

  /** Role-shaped frames for the report queries. */
  private def pubs(t: Tables): DataFrame =
    t.orders.select(
      col("o_orderkey").as("pub_id"),
      year(col("o_orderdate")).cast("long").as("pub_year"),
      col("o_orderpriority").as("title")
    )
  /** Both association tables shuffle by pub_id ONCE each: hash(pub_id)
    * satisfies every downstream clustering — the pair distinct
    * (pub_id ⊆ the distinct key) and the per-pub report aggregations —
    * so each branch's whole distinct→aggregate chain runs on its one
    * REPARTITION_BY_COL exchange with no further shuffles. Before
    * this, each branch shuffled twice (all-column distinct, then a
    * re-shuffle for the pub_id agg): 5 exchanges per report, now 3
    * (measured at sf1: by_author 3.41→2.33 s, by_dept 3.67→1.80 s,
    * by_group 2.89→1.55 s). Catalyst prunes each branch's unused
    * column below its exchange, so the branches scan lineitem
    * separately — intentional: two 2-column pruned scans shuffle the
    * same total bytes as one shared 3-column exchange would, without
    * pinning a fact-table-sized cache (the right 100 TB trade).
    */
  private def assoc(t: Tables): DataFrame =
    t.lineitem
      .select(col("l_orderkey").as("pub_id"), col("l_suppkey").as("author_id"),
        col("l_partkey").as("funder_id"))
      .repartition(col("pub_id"))
  private def pubAuthor(t: Tables): DataFrame =
    assoc(t).select("pub_id", "author_id").distinct()
  private def authors(t: Tables): DataFrame =
    t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("s_suppkey").as("author_id"), col("s_name").as("author_name"),
        col("n_name").as("school"), col("r_name").as("dept"))
  private def pubFunder(t: Tables): DataFrame =
    assoc(t).select("pub_id", "funder_id").distinct()
  private def funders(t: Tables): DataFrame =
    t.part.select(col("p_partkey").as("funder_id"), (col("p_size") > 25).as("federal"))

  val queries: Map[String, Q] = Map(
    // #14/#16 ordered precedence with valid-year guard: rule 1 is
    // deliberately invalid for every third row, so the fallback fires.
    "q_distill_first" -> { (s, dir) =>
      val o = Tables(s, dir).orders
      val bump = when(col("o_orderkey") % 3 === 0, lit(10000)).otherwise(lit(0))
      o.select(
        col("o_orderkey"),
        Distill.firstValid(
          Distill.validYear(year(col("o_orderdate")) + bump, CurrentYear),
          Distill.validYear(year(col("o_orderdate")) - 1, CurrentYear)
        ).as("pub_year")
      )
    },

    // #15 JSONPath rules over a JSON string column + positive guard +
    // missing-path fallback (distiller JsonPathRule semantics). ONE
    // from_json parse per row — every rule then reads struct fields, so
    // the JSON cost doesn't multiply with the number of rules.
    "q_distill_json" -> { (s, dir) =>
      val e = Tables(s, dir).events
      // Fields parse as STRING and try_cast per field: a single
      // mistyped field must not null the whole struct (PERMISSIVE
      // from_json would), matching per-field JsonPathRule + oracle
      // json_extract_string semantics. Still ONE parse per row.
      val schema = org.apache.spark.sql.types.DataType.fromDDL("STRUCT<k: STRING, m: STRING>")
      e.select(col("event_id"), from_json(col("props"), schema).as("p"))
        .select(
          col("event_id"),
          Distill.firstValid(Distill.positiveNumber(col("p.k")), lit(0L)).as("k"),
          Distill.firstValid(col("p.m").try_cast("long"), lit(-1L)).as("m")
        )
    },

    // #17 type normalization: dictionary hit or str.capitalize fallback.
    "q_type_normalize" -> { (s, dir) =>
      val rawTypes = typedlit(Seq("journal article", "book-chapter", "preprint", "published erratum", "data set", "zine"))
      Tables(s, dir).orders.select(
        col("o_orderkey"),
        element_at(rawTypes, (col("o_orderkey") % 6 + 1).cast("int")).as("raw_type")
      ).withColumn("norm_type", TypeNormalize.normalizeType(col("raw_type")))
    },

    // #18 citation_count = null-safe max over candidate sources.
    "q_greatest_sources" -> { (s, dir) =>
      val c = Tables(s, dir).customer
      c.select(
        col("c_custkey"),
        greatest(
          (col("c_custkey") % 90).cast("long"),
          (col("c_nationkey") * 3).cast("long"),
          when(col("c_custkey") % 7 === 0, lit(null).cast("long")).otherwise(lit(50L))
        ).as("citation_count")
      )
    },

    // #28 sulpub "Last, F." name flip + join_keys assembly.
    "q_name_assembly" -> { (s, dir) =>
      val c = Tables(s, dir).customer
      c.select(
        col("c_custkey"),
        Normalizers.flipName(concat(col("c_name"), lit(", A. B."))).as("flipped"),
        Normalizers.joinKeys(
          when(col("c_custkey") % 5 === 0, lit(null).cast("string")).otherwise(lit("Dr.")),
          col("c_name")
        ).as("full_name")
      )
    },

    // #21 APC rule chain: located value unless closed, else OA defaults.
    "q_apc" -> { (s, dir) =>
      val oaStatuses = typedlit(Seq("closed", "diamond", "gold", "hybrid", "bronze"))
      val o = Tables(s, dir).orders
      val candidate = Distill.positiveNumber(
        when(col("o_orderkey") % 4 === 0, floor(col("o_totalprice") / 100))
      )
      val oa = element_at(oaStatuses, (col("o_orderkey") % 5 + 1).cast("int"))
      o.select(
        col("o_orderkey"),
        oa.as("oa_status"),
        Rialto.apc(candidate, oa).as("apc")
      )
    },

    // #22 federal-funder membership: normalized name in the dataset OR
    // GRID id in the dataset (funders/dataset.py is_federal +
    // is_federal_grid_id) OR — the OpenAlex path — a ROR id whose
    // GRID equivalent is in the dataset (ror_grid_dataset.py
    // convert_ror_to_grid at linker.py:178). The synthetic mapping
    // covers ror r0..r19 → grid.90..grid.919; rors ≥ r20 translate to
    // NULL like an unmapped ROR. grid.91..93 are federal ONLY through
    // the translation (no direct grid column ever carries them).
    "q_federal_match" -> { (s, dir) =>
      import s.implicits._
      val federal = (1 to 5).map(i => f"supplier#$i%09d")
      val federalGrids = (1 to 5).map(i => s"grid.$i") ++ (1 to 3).map(i => s"grid.9$i")
      val rorGrid = (0 until 20)
        .map(k => (s"https://ror.org/r$k", s"grid.9$k"))
        .toDF("ror_id", "grid_id")
      val sup = Tables(s, dir).supplier
      val raw = concat(col("s_name"), when(col("s_suppkey") % 3 === 0, lit(" (FED)")).otherwise(lit("")))
      val grid = concat(lit("grid."), (col("s_suppkey") % 40).cast("string"))
      val ror = concat(lit("https://ror.org/r"), (col("s_suppkey") % 50).cast("string"))
      val withRor = Rialto.rorToGrid(
        sup.select(col("s_suppkey"), raw.as("__raw"), grid.as("grid_id"), ror.as("ror_id")),
        "ror_id", rorGrid)
      withRor.select(
        col("s_suppkey"),
        Normalizers.normalizeFunderName(col("__raw")).as("norm_name"),
        col("grid_id"),
        col("ror_id"),
        col("grid_from_ror"),
        (Rialto.isFederal(col("__raw"), federal) ||
          Rialto.isFederalGridId(col("grid_id"), federalGrids) ||
          coalesce(Rialto.isFederalGridId(col("grid_from_ror"), federalGrids), lit(false))
        ).as("federal")
      )
    },

    // #23 funder link: explode-equivalent association dedupe + link-back.
    "q_funder_link" -> { (s, dir) =>
      val t = Tables(s, dir)
      pubFunder(t)
        .groupBy("funder_id")
        .agg(count(lit(1)).as("n_pubs"))
        .join(broadcast(funders(t)), "funder_id")
        .select("funder_id", "federal", "n_pubs")
    },

    // #20 duplicate-group merge: survivor payload + unioned associations.
    "q_dedupe_merge_assoc" -> { (s, dir) =>
      Rialto.mergeAssociations(
        Tables(s, dir).lineitem,
        keys = Seq("l_orderkey", "l_linenumber"),
        payload = col("l_quantity"),
        assoc = col("l_suppkey")
      )
    },

    // #30 batch upsert: incoming wins, action column like the reference.
    "q_upsert_merge" -> { (s, dir) =>
      val o = Tables(s, dir).orders
      val existing = o.filter(col("o_orderkey") % 2 === 0).select(col("o_orderkey"), col("o_totalprice"))
      // +1000 is exact in binary floating point (unlike *1.1), so the
      // oracle compare is bit-stable.
      val incoming = o.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), (col("o_totalprice") + 1000).as("o_totalprice"))
      Rialto.upsert(existing, incoming, "o_orderkey")
        .select(
          col("o_orderkey"),
          col("row.o_totalprice").as("price"),
          col("action")
        )
    },

    // #15 deep: schema-full JSON parsing round trip — build a
    // publication-shaped JSON document per row, parse it back with
    // from_json, distill nested fields (the openalex_json access
    // pattern with a real schema instead of string paths).
    "q_distill_nested" -> { (s, dir) =>
      val t = Tables(s, dir)
      val doc = t.orders
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .select(
          col("o_orderkey"),
          to_json(struct(
            col("o_orderkey").as("id"),
            struct(col("c_name").as("name"), col("c_acctbal").as("bal")).as("author"),
            array(col("o_orderpriority"), col("o_orderstatus")).as("tags")
          )).as("pub_json")
        )
      val schema = org.apache.spark.sql.types.DataType.fromDDL(
        "STRUCT<id: BIGINT, author: STRUCT<name: STRING, bal: DOUBLE>, tags: ARRAY<STRING>>")
      doc.select(
        col("o_orderkey"),
        from_json(col("pub_json"), schema).as("p")
      ).select(
        col("o_orderkey"),
        col("p.author.name").as("author_name"),
        col("p.author.bal").as("bal"),
        element_at(col("p.tags"), 1).as("first_tag")
      )
    },

    // ISSN validation + crossref tag-strip distill helpers.
    "q_issn_clean" -> { (s, dir) =>
      val c = Tables(s, dir).customer
      val issn = concat(
        lpad((col("c_custkey") % 10000).cast("string"), 4, "0"), lit("-"),
        lpad((col("c_custkey") % 1000).cast("string"), 3, "0"),
        when(col("c_custkey") % 2 === 0, lit("X")).otherwise(lit("7"))
      )
      val broken = when(col("c_custkey") % 5 === 0, lit("not-an-issn")).otherwise(issn)
      c.select(
        col("c_custkey"),
        broken.as("issn"),
        Normalizers.isValidIssn(broken).as("issn_ok"),
        Normalizers.stripTags(concat(lit("<jats:p>Abstract for "), col("c_name"), lit("</jats:p>"))).as("clean_abstract")
      )
    },

    // validate.py cohort coverage: % of each segment with an "orcid".
    "q_validation" -> { (s, dir) =>
      val c = Tables(s, dir).customer
        .withColumn("orcid", when(col("c_custkey") % 3 === 0, lit(null)).otherwise(col("c_name")))
      Validation.cohortFieldCoverage(c, Seq("c_mktsegment"), col("orcid"))
    },

    // Harvest fill-in merge: per-source batches keyed by "DOI" fold
    // into one row with a struct per source, then distill across them.
    "q_harvest_merge" -> { (s, dir) =>
      val o = Tables(s, dir).orders
      val merged = Rialto.harvestMerge(
        Seq(
          "sulpub" -> o.filter(col("o_orderkey") % 2 === 0).select("o_orderkey", "o_totalprice"),
          "openalex" -> o.filter(col("o_orderkey") % 3 === 0).select("o_orderkey", "o_orderpriority"),
          "wos" -> o.filter(col("o_orderkey") % 5 === 0).select("o_orderkey", "o_orderstatus")
        ),
        key = "o_orderkey"
      )
      merged.select(
        col("o_orderkey"),
        col("sulpub_json").isNotNull.as("has_sulpub"),
        col("openalex_json").isNotNull.as("has_openalex"),
        col("wos_json").isNotNull.as("has_wos"),
        Distill.firstValid(
          col("openalex_json.o_orderpriority"),
          col("wos_json.o_orderstatus"),
          lit("none")
        ).as("title")
      )
    },

    // End-to-end pipeline flagship: the reference's whole flow -
    // harvest merge -> distill -> author link -> funder flag -> school
    // report - as ONE declarative plan (no intermediate tables).
    "q_pipeline_full" -> { (s, dir) =>
      val t = Tables(s, dir)
      val o = t.orders
      val merged = Rialto.harvestMerge(
        Seq(
          "sulpub" -> o.filter(col("o_orderkey") % 2 === 0).select("o_orderkey", "o_totalprice", "o_orderdate"),
          "openalex" -> o.filter(col("o_orderkey") % 3 === 0).select("o_orderkey", "o_orderpriority"),
          "wos" -> o.filter(col("o_orderkey") % 5 === 0).select("o_orderkey", "o_orderstatus")
        ),
        key = "o_orderkey"
      )
      // Checkpointed: pubs feeds TWO consumers with DIFFERENT
      // projections (the pub×author join reads only pub_id; pubFull
      // reads pub_id+pub_year), so ReuseExchange cannot dedupe them —
      // unpersisted, the whole harvestMerge outer-join fold ran twice
      // (the pas reuse below, by contrast, has identical subplans and
      // does get exchange reuse).
      val pubs = merged.select(
        col("o_orderkey").as("pub_id"),
        Distill.firstValid(
          Distill.validYear(year(col("sulpub_json.o_orderdate")), 2026),
          lit(1990L)
        ).as("pub_year")
      ).localCheckpoint(true)
      val authors = t.customer
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("school"), (col("c_acctbal") > 5000).as("academic"))
      val pa = o.select(col("o_orderkey").as("pub_id"), col("o_custkey"))
        .join(pubs.select("pub_id"), "pub_id")
        .join(broadcast(authors), col("o_custkey") === col("c_custkey"))
      // One (pub_id, school) pre-aggregation feeds BOTH consumers
      // below: the per-pub academic flag folds over it and the
      // school report joins it directly — the identical exchange
      // subplan is computed once (ReuseExchange), where aggregating
      // pa twice re-ran the scan+joins.
      val pas = pa.groupBy("pub_id", "school").agg(bool_or(col("academic")).as("school_academic"))
      val academic = pas.groupBy("pub_id").agg(bool_or(col("school_academic")).as("academic_authored"))
      val federal = t.lineitem.select(col("l_orderkey").as("pub_id"), col("l_partkey")).distinct()
        .join(broadcast(t.part), col("p_partkey") === col("l_partkey"))
        .groupBy("pub_id").agg(bool_or(col("p_size") > 25).as("federally_funded"))
      val pubFull = pubs
        .join(academic, Seq("pub_id"), "left")
        .join(federal, Seq("pub_id"), "left")
        .select(
          col("pub_id"), col("pub_year"),
          coalesce(col("academic_authored"), lit(false)).as("academic_authored"),
          coalesce(col("federally_funded"), lit(false)).as("federally_funded")
        )
      pas.select("pub_id", "school")
        .join(pubFull, "pub_id")
        .groupBy("school")
        .agg(
          count(lit(1)).as("n_pubs"),
          count(when(col("federally_funded"), 1)).as("n_federal"),
          count(when(col("academic_authored"), 1)).as("n_academic"),
          count(when(col("pub_year") >= 1995, 1)).as("n_recent")
        )
    },

    // #24 publications report.
    "q_report_publications" -> { (s, dir) =>
      val t = Tables(s, dir)
      Reports.publications(pubs(t), pubFunder(t), funders(t))
    },

    // #51c pure-SQL surface twin of the publications report: ONE ANSI
    // string executed verbatim by spark.sql over the SqlSurface views
    // (the JDBC/Connect client path) AND by DuckDB as the oracle — the
    // SQL-only route to the flagship is itself oracle-proven, and the
    // API twin (q_report_publications) must hash-match it.
    "q_sql_report" -> { (s, dir) =>
      graft.SqlSurface.registerTables(s, dir)
      s.sql(reportAnsiSql)
    },

    // #24b academic_council_authored / faculty_authored distill flags
    // (harvest_incremental/distill.py:72-87): bool-any over the pub's
    // joined authors; pubs with no authors coalesce to false like the
    // reference's any([]).
    "q_distill_authored" -> { (s, dir) =>
      val t = Tables(s, dir)
      val auth = t.supplier.select(
        col("s_suppkey").as("author_id"),
        (col("s_suppkey") % 7 === 0).as("academic_council"),
        when(col("s_suppkey") % 3 === 0, "faculty").otherwise("staff").as("role"))
      pubs(t)
        .join(Reports.authoredFlags(pubAuthor(t), auth), Seq("pub_id"), "left")
        .select(
          col("pub_id"),
          coalesce(col("academic_council_authored"), lit(false)).as("academic_council_authored"),
          coalesce(col("faculty_authored"), lit(false)).as("faculty_authored"))
    },

    // #25 publications_by_<dim> report (school ≈ supplier nation).
    "q_report_by_group" -> { (s, dir) =>
      val t = Tables(s, dir)
      Reports.publicationsByGroup(pubs(t), pubAuthor(t), authors(t), pubFunder(t), funders(t), Seq("school"))
    },

    // #25b publications_by_department report (two author-dim keys,
    // mirroring the reference's 4-table publish set).
    "q_report_by_dept" -> { (s, dir) =>
      val t = Tables(s, dir)
      Reports.publicationsByGroup(pubs(t), pubAuthor(t), authors(t), pubFunder(t), funders(t), Seq("school", "dept"))
    },

    // publish/orcid.py integration stats: counts by update scope.
    "q_orcid_stats" -> { (s, dir) =>
      val c = Tables(s, dir).customer
        .withColumn("has_orcid", col("c_custkey") % 3 =!= 0)
        .withColumn("read_write_scope", col("c_custkey") % 6 === 1)
      c.agg(
        count(when(col("has_orcid") && !col("read_write_scope"), 1)).as("read_only_scope"),
        count(when(col("has_orcid") && col("read_write_scope"), 1)).as("read_write_scope"),
        count(when(!col("has_orcid"), 1)).as("no_orcid")
      )
    },

    // open_access chain (preprint short-circuit, oa_all skip) + pages
    // range assembly (distiller/open_access.py, pages.py).
    "q_distill_more" -> { (s, dir) =>
      val o = Tables(s, dir).orders
      val types = when(col("o_orderkey") % 7 === 0, array(lit("Preprint"))).otherwise(array(lit("Article")))
      val dimOa = when(col("o_orderkey") % 3 === 0, array(lit("oa_all"), lit("gold")))
        .when(col("o_orderkey") % 3 === 1, array(lit("oa_all")))
        .otherwise(array().cast("array<string>"))
      val oaStatus = when(col("o_orderkey") % 2 === 0, lit("bronze")).otherwise(lit(null).cast("string"))
      val first = when(col("o_orderkey") % 4 =!= 0, lit("10")).otherwise(lit(null).cast("string"))
      val last = when(col("o_orderkey") % 5 =!= 0, lit("20")).otherwise(lit(null).cast("string"))
      o.select(
        col("o_orderkey"),
        Distill.openAccess(types, dimOa, oaStatus).as("open_access"),
        Distill.pagesRange(first, last).as("pages")
      )
    },

    // Positional first/last author (author_names.py first_author_name /
    // last_author_name): min_by/max_by over a composite position key.
    "q_author_position" -> { (s, dir) =>
      val t = Tables(s, dir)
      val pos = concat(lpad(col("l_linenumber").cast("string"), 3, "0"), lit("|"), col("s_name"))
      t.lineitem
        .join(broadcast(t.supplier), col("s_suppkey") === col("l_suppkey"))
        .groupBy("l_orderkey")
        .agg(
          min_by(col("s_name"), pos).as("first_author"),
          max_by(col("s_name"), pos).as("last_author")
        )
    },

    // ntile quantile bucketing per segment (window family
    // completeness). Five segments × corpus/5 rows each is the
    // few-massive-partitions window pathology — ranks come from the
    // two-pass range-partitioned GlobalRank, buckets from the
    // SQL-standard ntile closed form (bit-identical, spec-proven).
    "q_ntile" -> { (s, dir) =>
      GlobalRank.ntilePerGroup(
        Tables(s, dir).customer.select("c_custkey", "c_mktsegment", "c_acctbal"),
        Seq("c_mktsegment"), Seq(col("c_acctbal"), col("c_custkey")), 4, "quartile")
        .select("c_custkey", "c_mktsegment", "quartile")
    },

    // #26 publications_by_author report with author-list distills.
    "q_report_by_author" -> { (s, dir) =>
      val t = Tables(s, dir)
      Reports.publicationsByAuthor(pubs(t), pubAuthor(t), authors(t), pubFunder(t), funders(t))
    }
  )

  private val ffCte =
    """ff AS (
      |  SELECT l_orderkey AS pub_id, bool_or(p_size > 25) AS federally_funded
      |  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      |  JOIN part ON p_partkey = l_partkey GROUP BY l_orderkey)""".stripMargin

  /** Engine-portable ANSI for the publications report — run verbatim
    * by BOTH Spark (q_sql_report via spark.sql over GraftViews) and
    * DuckDB (as the oracle of both report twins). Restricted to the
    * shared dialect: bool_or, year(), COALESCE.
    */
  private[operators] val reportAnsiSql: String =
    s"""WITH $ffCte
       |SELECT o_orderkey AS pub_id, year(o_orderdate) AS pub_year, o_orderpriority AS title,
       |       COALESCE(ff.federally_funded, false) AS federally_funded
       |FROM orders LEFT JOIN ff ON ff.pub_id = o_orderkey""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_sql_report" -> reportAnsiSql,
    "q_distill_first" ->
      """SELECT o_orderkey,
        |  COALESCE(
        |    CASE WHEN year(o_orderdate) + (CASE WHEN o_orderkey % 3 = 0 THEN 10000 ELSE 0 END) <= 2026
        |         THEN year(o_orderdate) + (CASE WHEN o_orderkey % 3 = 0 THEN 10000 ELSE 0 END) END,
        |    CASE WHEN year(o_orderdate) - 1 <= 2026 THEN year(o_orderdate) - 1 END) AS pub_year
        |FROM orders""".stripMargin,
    "q_distill_json" ->
      """SELECT event_id,
        |  COALESCE(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 0
        |                THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END, 0) AS k,
        |  COALESCE(CAST(json_extract_string(props, '$.m') AS BIGINT), -1) AS m
        |FROM events""".stripMargin,
    "q_type_normalize" ->
      """SELECT o_orderkey,
        |  CASE o_orderkey % 6 WHEN 0 THEN 'journal article' WHEN 1 THEN 'book-chapter'
        |       WHEN 2 THEN 'preprint' WHEN 3 THEN 'published erratum'
        |       WHEN 4 THEN 'data set' ELSE 'zine' END AS raw_type,
        |  CASE o_orderkey % 6 WHEN 0 THEN 'Article' WHEN 1 THEN 'Chapter'
        |       WHEN 2 THEN 'Preprint' WHEN 3 THEN 'Correction/Retraction'
        |       WHEN 4 THEN 'Dataset' ELSE 'Zine' END AS norm_type
        |FROM orders""".stripMargin,
    "q_greatest_sources" ->
      """SELECT c_custkey,
        |  greatest(c_custkey % 90, c_nationkey * 3,
        |           CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE 50 END) AS citation_count
        |FROM customer""".stripMargin,
    "q_name_assembly" ->
      """SELECT c_custkey,
        |  'A. B. ' || c_name AS flipped,
        |  CASE WHEN c_custkey % 5 = 0 THEN c_name ELSE 'Dr. ' || c_name END AS full_name
        |FROM customer""".stripMargin,
    "q_apc" ->
      """SELECT o_orderkey,
        |  CASE o_orderkey % 5 WHEN 0 THEN 'closed' WHEN 1 THEN 'diamond' WHEN 2 THEN 'gold'
        |       WHEN 3 THEN 'hybrid' ELSE 'bronze' END AS oa_status,
        |  CASE WHEN o_orderkey % 4 = 0 AND o_orderkey % 5 = 0 THEN 0
        |       WHEN o_orderkey % 4 = 0 THEN CAST(floor(o_totalprice / 100) AS BIGINT)
        |       WHEN o_orderkey % 5 = 1 THEN 0
        |       WHEN o_orderkey % 5 = 2 THEN 2450
        |       WHEN o_orderkey % 5 = 3 THEN 3600
        |       ELSE NULL END AS apc
        |FROM orders""".stripMargin,
    "q_federal_match" ->
      """WITH rg AS (SELECT 'https://ror.org/r' || CAST(k AS VARCHAR) AS ror_id,
        |                   'grid.9' || CAST(k AS VARCHAR) AS grid_id
        |            FROM range(0, 20) t(k)),
        |s AS (SELECT s_suppkey,
        |        lower(regexp_replace(s_name || CASE WHEN s_suppkey % 3 = 0 THEN ' (FED)' ELSE '' END, ' ?\(.+\)$', '')) AS norm_name,
        |        'grid.' || CAST(s_suppkey % 40 AS VARCHAR) AS grid_id,
        |        'https://ror.org/r' || CAST(s_suppkey % 50 AS VARCHAR) AS ror_id
        |      FROM supplier)
        |SELECT s.s_suppkey, s.norm_name, s.grid_id, s.ror_id, rg.grid_id AS grid_from_ror,
        |  (s.norm_name IN ('supplier#000000001','supplier#000000002','supplier#000000003','supplier#000000004','supplier#000000005')
        |   OR s.s_suppkey % 40 BETWEEN 1 AND 5
        |   OR COALESCE(rg.grid_id IN ('grid.1','grid.2','grid.3','grid.4','grid.5','grid.91','grid.92','grid.93'), FALSE)) AS federal
        |FROM s LEFT JOIN rg ON s.ror_id = rg.ror_id""".stripMargin,
    "q_funder_link" ->
      """SELECT p_partkey AS funder_id, p_size > 25 AS federal, count(*) AS n_pubs
        |FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) l
        |JOIN part ON p_partkey = l_partkey
        |GROUP BY p_partkey, p_size > 25""".stripMargin,
    "q_dedupe_merge_assoc" ->
      """SELECT l_orderkey, l_linenumber, max(l_quantity) AS payload,
        |  string_agg(DISTINCT CAST(l_suppkey AS VARCHAR), '|' ORDER BY CAST(l_suppkey AS VARCHAR)) AS assoc_ids
        |FROM lineitem GROUP BY l_orderkey, l_linenumber""".stripMargin,
    "q_upsert_merge" ->
      """SELECT COALESCE(i.o_orderkey, e.o_orderkey) AS o_orderkey,
        |  COALESCE(i.p, e.o_totalprice) AS price,
        |  CASE WHEN e.o_orderkey IS NULL THEN 'inserted'
        |       WHEN i.o_orderkey IS NULL THEN 'noop'
        |       ELSE 'updated' END AS action
        |FROM (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0) e
        |FULL OUTER JOIN (SELECT o_orderkey, o_totalprice + 1000 AS p
        |                 FROM orders WHERE o_orderkey % 3 = 0) i
        |ON e.o_orderkey = i.o_orderkey""".stripMargin,
    "q_pipeline_full" ->
      """WITH pubs AS (
        |  SELECT k.o_orderkey AS pub_id,
        |         COALESCE(CASE WHEN k.o_orderkey % 2 = 0 AND year(k.o_orderdate) <= 2026
        |                       THEN year(k.o_orderdate) END, 1990) AS pub_year
        |  FROM orders k
        |  WHERE k.o_orderkey % 2 = 0 OR k.o_orderkey % 3 = 0 OR k.o_orderkey % 5 = 0),
        |authors AS (
        |  SELECT c_custkey, n_name AS school, c_acctbal > 5000 AS academic
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |pa AS (
        |  SELECT o_orderkey AS pub_id, school, academic
        |  FROM orders JOIN pubs ON pubs.pub_id = o_orderkey
        |  JOIN authors ON c_custkey = o_custkey),
        |academic AS (
        |  SELECT pub_id, bool_or(academic) AS academic_authored FROM pa GROUP BY pub_id),
        |federal AS (
        |  SELECT l_orderkey AS pub_id, bool_or(p_size > 25) AS federally_funded
        |  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) l
        |  JOIN part ON p_partkey = l_partkey GROUP BY l_orderkey),
        |pub_full AS (
        |  SELECT p.pub_id, p.pub_year,
        |         COALESCE(a.academic_authored, false) AS academic_authored,
        |         COALESCE(f.federally_funded, false) AS federally_funded
        |  FROM pubs p
        |  LEFT JOIN academic a ON a.pub_id = p.pub_id
        |  LEFT JOIN federal f ON f.pub_id = p.pub_id)
        |SELECT school,
        |       count(*) AS n_pubs,
        |       count(*) FILTER (WHERE federally_funded) AS n_federal,
        |       count(*) FILTER (WHERE academic_authored) AS n_academic,
        |       count(*) FILTER (WHERE pub_year >= 1995) AS n_recent
        |FROM (SELECT DISTINCT pub_id, school FROM pa) ps
        |JOIN pub_full USING (pub_id)
        |GROUP BY school""".stripMargin,
    "q_distill_nested" ->
      """SELECT o_orderkey, c_name AS author_name, c_acctbal AS bal, o_orderpriority AS first_tag
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q_issn_clean" ->
      """SELECT c_custkey,
        |  CASE WHEN c_custkey % 5 = 0 THEN 'not-an-issn'
        |       ELSE lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') || '-' ||
        |            lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') ||
        |            (CASE WHEN c_custkey % 2 = 0 THEN 'X' ELSE '7' END) END AS issn,
        |  CASE WHEN c_custkey % 5 = 0 THEN 'not-an-issn'
        |       ELSE lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') || '-' ||
        |            lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') ||
        |            (CASE WHEN c_custkey % 2 = 0 THEN 'X' ELSE '7' END) END
        |    SIMILAR TO '[0-9]{4}.[0-9]{3}[0-9X]' AS issn_ok,
        |  trim(regexp_replace('<jats:p>Abstract for ' || c_name || '</jats:p>', '<[A-Za-z/!?][^>]*>', '', 'g')) AS clean_abstract
        |FROM customer""".stripMargin,
    "q_validation" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  count(CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_name END) AS n_present,
        |  round(count(CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_name END) * 100.0 / count(*), 1) AS pct_present
        |FROM customer GROUP BY c_mktsegment""".stripMargin,
    "q_harvest_merge" ->
      """WITH s AS (SELECT o_orderkey AS k, o_totalprice FROM orders WHERE o_orderkey % 2 = 0),
        |o AS (SELECT o_orderkey AS k, o_orderpriority FROM orders WHERE o_orderkey % 3 = 0),
        |w AS (SELECT o_orderkey AS k, o_orderstatus FROM orders WHERE o_orderkey % 5 = 0)
        |SELECT COALESCE(s.k, o.k, w.k) AS o_orderkey,
        |       s.k IS NOT NULL AS has_sulpub,
        |       o.k IS NOT NULL AS has_openalex,
        |       w.k IS NOT NULL AS has_wos,
        |       COALESCE(o.o_orderpriority, w.o_orderstatus, 'none') AS title
        |FROM s
        |FULL OUTER JOIN o ON s.k = o.k
        |FULL OUTER JOIN w ON COALESCE(s.k, o.k) = w.k""".stripMargin,
    "q_report_publications" -> reportAnsiSql,
    "q_distill_authored" ->
      """WITH pa AS (SELECT DISTINCT l_orderkey AS pub_id, l_suppkey AS author_id FROM lineitem),
        |af AS (SELECT pa.pub_id,
        |         bool_or(s_suppkey % 7 = 0) AS academic_council_authored,
        |         bool_or(s_suppkey % 3 = 0) AS faculty_authored
        |       FROM pa JOIN supplier ON s_suppkey = pa.author_id
        |       GROUP BY pa.pub_id)
        |SELECT o_orderkey AS pub_id,
        |  COALESCE(af.academic_council_authored, FALSE) AS academic_council_authored,
        |  COALESCE(af.faculty_authored, FALSE) AS faculty_authored
        |FROM orders LEFT JOIN af ON af.pub_id = o_orderkey""".stripMargin,
    "q_report_by_group" ->
      s"""WITH $ffCte
         |SELECT DISTINCT o_orderkey AS pub_id, n_name AS school, year(o_orderdate) AS pub_year,
         |       o_orderpriority AS title, COALESCE(ff.federally_funded, false) AS federally_funded
         |FROM orders
         |JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) pa ON pa.l_orderkey = o_orderkey
         |JOIN supplier ON s_suppkey = pa.l_suppkey
         |JOIN nation ON n_nationkey = s_nationkey
         |LEFT JOIN ff ON ff.pub_id = o_orderkey""".stripMargin,
    "q_distill_more" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 7 = 0 THEN 'preprint'
        |       WHEN o_orderkey % 3 = 0 THEN 'gold'
        |       WHEN o_orderkey % 2 = 0 THEN 'bronze'
        |       ELSE NULL END AS open_access,
        |  CASE WHEN o_orderkey % 4 <> 0 AND o_orderkey % 5 <> 0 THEN '10-20'
        |       WHEN o_orderkey % 4 <> 0 THEN '10'
        |       WHEN o_orderkey % 5 <> 0 THEN '20'
        |       ELSE NULL END AS pages
        |FROM orders""".stripMargin,
    "q_author_position" ->
      """SELECT l_orderkey,
        |  arg_min(s_name, lpad(CAST(l_linenumber AS VARCHAR), 3, '0') || '|' || s_name) AS first_author,
        |  arg_max(s_name, lpad(CAST(l_linenumber AS VARCHAR), 3, '0') || '|' || s_name) AS last_author
        |FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        |GROUP BY l_orderkey""".stripMargin,
    "q_ntile" ->
      """SELECT c_custkey, c_mktsegment,
        |  ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS quartile
        |FROM customer""".stripMargin,
    "q_report_by_dept" ->
      s"""WITH $ffCte
         |SELECT DISTINCT o_orderkey AS pub_id, n_name AS school, r_name AS dept,
         |       year(o_orderdate) AS pub_year, o_orderpriority AS title,
         |       COALESCE(ff.federally_funded, false) AS federally_funded
         |FROM orders
         |JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) pa ON pa.l_orderkey = o_orderkey
         |JOIN supplier ON s_suppkey = pa.l_suppkey
         |JOIN nation ON n_nationkey = s_nationkey
         |JOIN region ON r_regionkey = n_regionkey
         |LEFT JOIN ff ON ff.pub_id = o_orderkey""".stripMargin,
    "q_orcid_stats" ->
      """SELECT count(*) FILTER (WHERE c_custkey % 3 <> 0 AND NOT c_custkey % 6 = 1) AS read_only_scope,
        |       count(*) FILTER (WHERE c_custkey % 3 <> 0 AND c_custkey % 6 = 1) AS read_write_scope,
        |       count(*) FILTER (WHERE c_custkey % 3 = 0) AS no_orcid
        |FROM customer""".stripMargin,
    "q_report_by_author" ->
      s"""WITH $ffCte,
         |pa AS (SELECT DISTINCT l_orderkey AS pub_id, l_suppkey AS author_id FROM lineitem),
         |aa AS (SELECT pub_id,
         |         string_agg(DISTINCT s_name, '|' ORDER BY s_name) AS author_list_names,
         |         min(s_name) AS first_author_name, max(s_name) AS last_author_name
         |       FROM pa JOIN supplier ON s_suppkey = author_id GROUP BY pub_id)
         |SELECT o_orderkey AS pub_id, year(o_orderdate) AS pub_year, o_orderpriority AS title,
         |       COALESCE(ff.federally_funded, false) AS federally_funded,
         |       aa.author_list_names, aa.first_author_name, aa.last_author_name
         |FROM orders
         |LEFT JOIN ff ON ff.pub_id = o_orderkey
         |LEFT JOIN aa ON aa.pub_id = o_orderkey""".stripMargin
  )
}
