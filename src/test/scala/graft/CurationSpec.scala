package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Graph}
import graft.plans.NfcNormalize

/** Unit coverage for the curation operators on crafted rows — the
  * oracle queries (CurationQueries) verify them against DuckDB on the
  * corpus; these pin the edge semantics on inputs the corpus lacks.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii scrubs email, ssn, phone, ip with typed tokens") {
    val in = Seq(
      "mail a.b+c@dept.example.org now",
      "ssn 123-45-6789 phone 650-555-1234 alt 650 555 1234",
      "ip 10.0.255.3 not 1234.5.6.7890",
      "clean text").toDF("t")
    val out = in.select(Curation.redactPii(col("t")).as("r")).as[String].collect()
    assert(out(0) == "mail <EMAIL> now")
    assert(out(1) == "ssn <SSN> phone <PHONE> alt <PHONE>")
    // 1234.5.6.7890 has no digit-boundary: \b[0-9]{1,3} can't start
    // inside 1234, so only the valid ip is redacted
    assert(out(2).startsWith("ip <IP> not "))
    assert(out(3) == "clean text")
  }

  test("piiCounts counts per class on progressively-redacted text") {
    val in = Seq("a@b.co c@d.eu ssn 123-45-6789 ip 1.2.3.4").toDF("t")
    val r = in.select(Curation.piiCounts(col("t")).as("c"))
      .select(col("c.emails"), col("c.ssns"), col("c.phones"), col("c.ips"))
      .head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) == ((2, 1, 0, 1)))
  }

  test("NfcNormalize composes decomposed accents; idempotent on NFC; null-safe") {
    val in = Seq("café", "café", "plain").toDF("t")
    val out = in.select(NfcNormalize(col("t")).as("n")).as[String].collect()
    assert(out(0) == "café" && out(1) == "café" && out(2) == "plain")
    val n = Seq[Option[String]](None).toDF("t").select(NfcNormalize(col("t"))).head()
    assert(n.isNullAt(0))
  }

  test("cleanUnicode strips C0 controls but keeps tab/newline/cr") {
    val out = Seq("ab\tc\nd\re").toDF("t")
      .select(Curation.cleanUnicode(col("t"))).as[String].head()
    assert(out == "ab\tc\nd\re")
  }

  test("slidingChunks covers all tokens with stride overlap; short doc = one chunk") {
    val toks = (1 to 80).map(i => s"w$i")
    val chunks = Seq(toks.mkString(" ")).toDF("t")
      .select(explode(Curation.slidingChunks(split(col("t"), " "), 32, 24)).as("u"))
      .select("u.chunk_id", "u.chunk_text", "u.chunk_tokens")
      .collect()
    // starts at 1, 25, 49, 73 → 4 chunks; last has 80-73+1 = 8 tokens
    assert(chunks.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(chunks.map(_.getLong(2)).toSeq == Seq(32L, 32L, 32L, 8L))
    assert(chunks(0).getString(1).startsWith("w1 w2 ") && chunks(3).getString(1) == toks.drop(72).mkString(" "))
    // every token appears in some chunk
    val seen = chunks.flatMap(_.getString(1).split(" ")).toSet
    assert(seen == toks.toSet)
    val one = Seq("a b c").toDF("t")
      .select(explode(Curation.slidingChunks(split(col("t"), " "), 32, 24)).as("u"))
      .select("u.chunk_tokens").as[Long].collect()
    assert(one.toSeq == Seq(3L))
  }

  test("packSequences fills bins to budget within (stratum, shard)") {
    val df = (0 until 40).map(i => (i.toLong, "en")).toDF("doc_id", "lang")
    val packed = Curation.packSequences(df, "doc_id", "lang",
      tokensCol = lit(600L), budget = 2048L, nShards = 1)
    // 600-token docs: prefix sums 0,600,...; bin = prev//2048 → 4 docs per
    // bin (prev 0/600/1200/1800), then 2400//2048=1...
    val bins = packed.groupBy("bin").count().orderBy("bin").as[(Long, Long)].collect()
    assert(bins.take(3).map(_._2).forall(c => c == 3L || c == 4L))
    val pos = packed.filter(col("bin") === 0).orderBy("doc_id").select("pos").as[Long].collect()
    assert(pos.toSeq == (1L to pos.length).toSeq)
  }

  test("hashSample is deterministic and near the target rate") {
    val df = (0 until 4000).map(_.toLong).toDF("id")
    val kept = df.filter(Curation.hashSample(col("id"), "40000000")).count()
    val kept2 = df.filter(Curation.hashSample(col("id"), "40000000")).count()
    assert(kept == kept2)
    assert(math.abs(kept / 4000.0 - 0.25) < 0.03)
  }

  test("polyFingerprint distinguishes word order and equals a reference fold") {
    val P = 1000000007L
    def ref(s: String): Long =
      s.split(" ").foldLeft(0L)((h, w) =>
        (h * 31 + w.foldLeft(0L)((g, c) => (g * 131 + c.toInt) % P)) % P)
    val rows = Seq("the quick fox", "fox quick the", "the quick fox").toDF("t")
      .select(Curation.polyFingerprint(col("t"))).as[Long].collect()
    assert(rows(0) == ref("the quick fox"))
    assert(rows(1) == ref("fox quick the"))
    assert(rows(0) != rows(1) && rows(0) == rows(2))
  }

  test("duplicateWindowStats flags cross-doc shared windows only") {
    import graft.operators.TextDedup
    val shared = "one two three four five six seven eight"
    val corpus = Seq(
      (1L, s"$shared unique1 tail1"),
      (2L, s"prefix2 $shared"),
      (3L, "totally different words with no overlap at all here"),
      (4L, "short doc")).toDF("doc_id", "text")
    val out = TextDedup.duplicateWindowStats(corpus, "doc_id", "text", window = 8)
      .select("doc_id", "n_windows", "dup_windows").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1: 10 tokens -> 3 windows, the first (= shared) also in doc 2
    assert(out(1L) == ((3L, 1L)))
    // doc 2: 9 tokens -> 2 windows, the second is the shared one
    assert(out(2L) == ((2L, 1L)))
    assert(out(3L)._2 == 0L)         // no cross-doc windows
    assert(!out.contains(4L))        // under window size -> no rows
  }

  test("extractHtmlText strips script/style/comments/tags, decodes entities once") {
    import graft.operators.Curation
    val html = "<html><head><script type=\"text/javascript\">\nif (a < b && c > d) { alert('</p>?') }\n" +
      "</script><style>\nbody { color: red }\n</style></head>" +
      "<body><!-- comment\nspanning lines --><p>Hello &amp; welcome</p>" +
      "<div>x &lt; y, &quot;quoted&quot;, &#39;apos&#39;, 5&nbsp;&copy;</div>" +
      "<p>literal &amp;lt; stays</p></body></html>"
    val out = Seq(html).toDF("h").select(Curation.extractHtmlText(col("h")).as("t"))
      .as[String].head()
    // single-pass entity semantics: "&amp;lt;" -> "&lt;", NOT "<"
    assert(out == "Hello & welcome x < y, \"quoted\", 'apos', 5 © literal &lt; stays")
  }

  test("fixMojibake repairs cp1252 double-encoding; count matches fixes applied") {
    import graft.operators.Curation
    def moji(s: String) = new String(s.getBytes("UTF-8"), "windows-1252")
    val dirty = s"caf${moji("é")} ${moji("“")}it${moji("’")}s 25${moji("°")}${moji("…")} ni${moji("ñ")}o"
    val row = Seq(dirty).toDF("t")
      .select(Curation.fixMojibake(col("t")).as("f"), Curation.countMojibake(col("t")).as("n"))
      .as[(String, Long)].head()
    assert(row._1 == "café “it’s 25°… niño")
    assert(row._2 == 6L)
    // already-clean text: untouched, zero count
    val clean = Seq("café “it’s 25°… niño").toDF("t")
      .select(Curation.fixMojibake(col("t")).as("f"), Curation.countMojibake(col("t")).as("n"))
      .as[(String, Long)].head()
    assert(clean == (("café “it’s 25°… niño", 0L)))
  }

  test("removeDuplicateWindows cuts covered tokens, passes untouched docs through") {
    import graft.operators.TextDedup
    val shared = "one two three four five six seven eight"
    val corpus = Seq(
      (1L, s"$shared unique1 tail1"),
      (2L, s"prefix2 $shared"),
      (3L, "totally different words with no overlap at all here"),
      (4L, "short doc"),
      (5L, shared)).toDF("doc_id", "text")
    val out = TextDedup.removeDuplicateWindows(corpus, "doc_id", "text", window = 8)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1: positions 1-8 covered -> "unique1 tail1" survives
    assert(out(1L) == ((10L, 8L, "unique1 tail1")))
    // doc 2: positions 2-9 covered -> "prefix2" survives
    assert(out(2L) == ((9L, 8L, "prefix2")))
    // doc 3: no duplicated window -> original text, zero removed
    assert(out(3L) == ((9L, 0L, "totally different words with no overlap at all here")))
    // doc 4: under window size -> untouched
    assert(out(4L) == ((2L, 0L, "short doc")))
    // doc 5: fully covered -> empty text, not the original and not null
    assert(out(5L) == ((8L, 8L, "")))
  }

  test("CompressionRatio orders repetitive below diverse text; handles edges") {
    import graft.plans.CompressionRatio
    val rep = ("spam " * 200).trim
    val div = (1 to 200).map(i => s"w${i * 7919 % 9973}").mkString(" ")
    val df = Seq(rep, div, "x", "").toDF("t")
    val out = df.select(CompressionRatio(col("t"))).as[Double].collect()
    assert(out(0) < out(1), s"repetitive ${out(0)} !< diverse ${out(1)}")
    assert(out(0) < 0.1)             // 200x the same word compresses hard
    assert(out(2) > 0.5 && out(3) == 1.0) // tiny + empty edges
    // deterministic across evaluations
    val again = df.select(CompressionRatio(col("t"))).as[Double].collect()
    assert(out.toSeq == again.toSeq)
  }

  test("bm25TopK matches a scalar reference implementation") {
    import graft.operators.TextRank
    val corpus = Seq(
      (1L, "spark fast spark engine"),
      (2L, "slow batch engine"),
      (3L, "spark spark spark spark"),
      (4L, "nothing relevant here")).toDF("doc_id", "text")
    val got = TextRank.bm25TopK(corpus, "doc_id", "text", Seq("spark", "batch"), k = 4)
      .select("id", "score").as[(Long, Double)].collect().toMap

    // scalar BM25 with the same constants
    val docs = Map(1L -> "spark fast spark engine", 2L -> "slow batch engine",
      3L -> "spark spark spark spark", 4L -> "nothing relevant here")
    val toks = docs.map { case (k, v) => k -> v.split(" ").toSeq }
    val n = docs.size.toDouble
    val avg = toks.values.map(_.size).sum / n
    def score(id: Long): Double = Seq("spark", "batch").map { t =>
      val tf = toks(id).count(_ == t).toDouble
      if (tf == 0) 0.0
      else {
        val df = toks.values.count(_.contains(t)).toDouble
        val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * toks(id).size / avg))
      }
    }.sum
    for ((id, s) <- got) assert(math.abs(s - score(id)) < 1e-3, s"doc $id: $s vs ${score(id)}")
    assert(!got.contains(4L)) // no query terms -> not retrieved
    assert(got(3L) > got(1L)) // more hits, shorter doc -> higher score
  }

  test("Releasable storage level propagates to the operator cache (100 TB DISK_ONLY knob)") {
    import graft.operators.TextRank
    import org.apache.spark.storage.StorageLevel
    val corpus = Seq((1L, "a b c a"), (2L, "b c d e")).toDF("doc_id", "text")
    // Delta-based: other suites share this session and may legitimately
    // hold caches (localCheckpoints etc.) — judge only the RDDs THIS
    // call creates.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (res, handle) = TextRank.bigramLmScoreReleasable(
      corpus, "doc_id", "text", storage = StorageLevel.DISK_ONLY)
    try {
      res.collect()
      val added = (spark.sparkContext.getPersistentRDDs -- before).values
        .map(_.getStorageLevel).toSet
      assert(added.contains(StorageLevel.DISK_ONLY), added.toString)
      assert(!added.exists(_.useMemory), s"memory-backed cache leaked in: $added")
    } finally handle.release()
  }

  test("dedupLinesAcrossCorpus keeps first (doc, pos) occurrence; empty docs survive") {
    import graft.operators.TextDedup
    val docs = Seq(
      (1L, "common\nalpha\ncommon"),  // dup line inside one doc too
      (2L, "common\nbeta"),
      (3L, "common")                  // all boilerplate -> ""
    ).toDF("doc_id", "text")
    val out = TextDedup.dedupLinesAcrossCorpus(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "common\nalpha", 2L -> "beta", 3L -> ""))
  }

  test("blocklist: word-boundary + case-insensitive hits; substrings never match") {
    val words = Seq("ass", "casino")
    val in = Seq(
      "a classy grass assembly",   // every hit is embedded — zero matches
      "an Ass and a CASINO",       // case-insensitive, both match
      "ass casino ass",            // multiple hits counted
      "").toDF("t")
    val out = in.select(
      Curation.blocklistHits(col("t"), words).as("h"),
      Curation.blocklistKeep(col("t"), words).as("k")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 2L, 3L, 0L))
    assert(out.map(_.getBoolean(1)).toSeq == Seq(true, false, false, true))
    intercept[IllegalArgumentException](Curation.blocklistPattern(Seq("a|b")))
    intercept[IllegalArgumentException](Curation.blocklistPattern(Nil))
  }

  test("gopherStats measures line structure; gopherKeep thresholds") {
    val good = ((1 to 60).map(i => s"word$i").mkString(" ") + " the of and") // 63 words, no bullets
    val bullety = "- a\n- b\n- c\n- d\n- e\nthe of and to in is for on with a the of"
    val df = Seq(good, bullety).toDF("t")
    val out = df.select(
      Curation.gopherStats(col("t")).as("s"),
      functions.TextAnalysis.stopwordHits(col("t"), functions.TextAnalysis.langProfiles("en")).as("hits"))
      .select(col("s.n_words"), col("s.bullet_frac"),
        Curation.gopherKeep(col("s"), col("hits")).as("keep"))
      .collect()
    assert(out(0).getBoolean(2))                 // good doc kept
    assert(out(1).getDouble(1) > 0.8)            // 5/6 lines bullets
    assert(!out(1).getBoolean(2))                // dropped (bullets + too short)
  }
}

class AuthorDistillSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Distillers
  import graft.functions.Normalizers

  test("flipName is identical on codegen and interpreted (HOF-lambda) paths") {
    // Regression: slice(parts, 2, Int.MaxValue) overflowed start+length
    // in Slice's INTERPRETED eval (returning []) while codegen clamped —
    // the same expression gave two answers depending on evaluation path.
    val df = Seq("Stanford, L. D.").toDF("n")
    val direct = df.select(Normalizers.flipName(col("n"))).as[String].head()
    val inLambda = df.select(transform(array(col("n")), Normalizers.flipName _))
      .as[Seq[String]].head().head
    assert(direct == "L. D. Stanford" && inLambda == direct)
  }

  test("authorListNames: null matches dropped, empty rule falls through, no hit = []") {
    val df = Seq(1).toDF("x")
    val out = df.select(
      Distillers.authorListNames(
        array(lit(null).cast("string")),            // all-null hit -> miss
        array().cast("array<string>"),              // present-but-empty -> miss
        array(lit("A"), lit(null), lit("B")),       // winner, null dropped
        array(lit("C"))                             // unreachable
      ).as("n"),
      Distillers.authorListNames(lit(null).cast("array<string>")).as("none"))
    val r = out.head()
    assert(r.getSeq[String](0) == Seq("A", "B"))
    assert(r.getSeq[String](1) == Seq.empty)
  }

  test("first/last author orcid: positional chain + pubmed ORCID filter") {
    val df = Seq(1).toDF("x")
    val ids = array(
      struct(lit("GRID").as("source"), lit("g1").as("text")),
      struct(lit("ORCID").as("source"), lit("HTTPS://ORCID.ORG/0000-0001-0002").as("text")))
    val r = df.select(
      Distillers.pubmedOrcids(ids).as("pm"),
      Distillers.positionalOrcid(lit(null).cast("string"),
        lit(" https://sandbox.orcid.org/0000-0009-0008 ")).as("pos")).head()
    assert(r.getSeq[String](0) == Seq("HTTPS://ORCID.ORG/0000-0001-0002"))
    assert(r.getString(1) == "0000-0009-0008")
  }
}

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap

  /** Reference union-find for arbitrary edge lists. */
  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElseUpdate(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("long chain collapses to min id (diameter >> rounds)") {
    val chain = (0L until 200L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got.size == 201 && got.values.toSet == Set(0L))
  }

  test("random graph matches union-find reference") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(150).toLong, rnd.nextInt(150).toLong)).filter(e => e._1 != e._2)
    assert(cc(edges) == brute(edges))
  }

  test("disjoint cliques and singletons via connectedComponentsAll") {
    val edges = Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("src", "dst")
    val vertices = Seq(10L, 11L, 12L, 20L, 21L, 99L).toDF("id")
    val got = Graph.connectedComponentsAll(edges, "src", "dst", vertices, "id")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L, 99L -> 99L))
  }

  test("self-loops and duplicate edges are ignored") {
    val got = cc(Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("exhausting maxRounds before convergence throws, never returns a wrong mapping") {
    val chain = (0L until 200L).map(i => (i, i + 1)).toDF("src", "dst")
    val ex = intercept[IllegalStateException] {
      Graph.connectedComponents(chain, "src", "dst", maxRounds = 1).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("resampleFfill fills gaps with last observation, bounds grid to active span") {
    val ev = Seq(
      (1L, 0L, 10.0), (1L, 30L, 20.0),       // slot 0: mean 15
      (1L, 7200L, 7.0),                      // slot 7200; slot 3600 is a gap
      (2L, 3600L, 1.0)                       // second key: single slot, no gaps
    ).map { case (u, s, v) => (u, new java.sql.Timestamp(s * 1000L), v) }
      .toDF("user_id", "ts", "value")
    val out = graft.operators.TimeSeries.resampleFfill(ev, "user_id", "ts", "value", 3600L)
      .orderBy("key", "slot")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, 0L, 15.0, 15.0, false),      // observed mean
      (1L, 3600L, null, 15.0, true),    // gap carries forward
      (1L, 7200L, 7.0, 7.0, false),
      (2L, 3600L, 1.0, 1.0, false)))    // span bounded per key: no slot 0 row
  }

  test("frequentPairs counts within-basket pairs once each with support share") {
    val rows = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (3L, 10L)  // duplicate item in basket collapses
    ).toDF("basket", "item")
    val got = graft.operators.DataOps.frequentPairs(rows, "basket", "item", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.head == (10L, 20L, 3L, 1.0))           // in all 3 baskets
    assert(got.toSet.contains((10L, 30L, 1L, 0.333333)))
    assert(got.length == 3)                            // (10,20), (10,30), (20,30)
  }

  test("rollingStats: 4-row frame warms up from the first row") {
    val ev = Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 3.0), (1L, 4L, 4.0), (1L, 5L, 5.0))
      .map { case (u, t, v) => (u, new java.sql.Timestamp(t * 1000L), t, v) }
      .toDF("user_id", "ts", "event_id", "value")
    val got = graft.operators.TimeSeries.rollingStats(ev, "user_id", "ts", "event_id", "value", n = 4)
      .orderBy("event_id").collect()
      .map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got(0) == (1.0, 1.0, 1.0))        // frame of one
    assert(got(2) == (2.0, 1.0, 3.0))        // mean(1,2,3)
    assert(got(4) == (3.5, 2.0, 5.0))        // mean(2,3,4,5): row 1 dropped
  }

  test("scd2Merge closes changed/vanished rows, opens new versions, passes through the rest") {
    val hist = Seq(
      ("A", 1.0, 0L, Some(5L)),   // already-closed history: untouched
      ("A", 2.0, 5L, None),       // open, unchanged in snapshot
      ("B", 3.0, 0L, None),       // open, price changes
      ("C", 4.0, 0L, None)        // open, vanishes
    ).toDF("k", "price", "valid_from", "valid_to")
      .withColumn("valid_to", col("valid_to").cast("long"))
    val snap = Seq(("A", 2.0), ("B", 9.0), ("D", 7.0)).toDF("k", "price")
    val got = graft.operators.DataOps.scd2Merge(hist, snap, "k", Seq("price"), t = 10L)
      .collect().map(r => (r.getString(0), if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == Set(
      ("A", 5L, 1.0),    // closed history preserved
      ("A", -1L, 2.0),   // unchanged open row stays open
      ("B", 10L, 3.0),   // old B closed at t
      ("B", -1L, 9.0),   // new B version opened
      ("C", 10L, 4.0),   // vanished C closed
      ("D", -1L, 7.0)))  // new key opened
    // presence must come from the marker, not valid_from: an open row
    // with NULL valid_from still closes when its key vanishes
    val histNull = Seq(("E", 1.0)).toDF("k", "price")
      .withColumn("valid_from", lit(null).cast("long"))
      .withColumn("valid_to", lit(null).cast("long"))
    val gone = graft.operators.DataOps.scd2Merge(
      histNull, Seq.empty[(String, Double)].toDF("k", "price"), "k", Seq("price"), t = 10L)
      .collect()
    assert(gone.length == 1 && gone(0).getString(0) == "E" &&
      gone(0).isNullAt(1) && gone(0).getLong(2) == 10L)
  }

  test("equiDepthHistogram buckets 1..10 into five equal-count buckets") {
    val df = (1 to 10).map(_.toDouble).toDF("v")
    val got = graft.operators.DataOps.equiDepthHistogram(df, "v", nBuckets = 5)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == 5 && got.forall(_._2 == 2L))
    assert(got.head == (0L, 2L, 1.0, 2.0) && got.last == (4L, 2L, 9.0, 10.0))
  }

  test("sessionPaths splits on the gap and ranks deterministic path strings") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val ev = Seq(
      (1L, ts(0), "view", 1L), (1L, ts(10), "click", 2L),     // session 1: view>click
      (1L, ts(5000), "view", 3L), (1L, ts(5010), "click", 4L), // session 2 (gap): view>click
      (2L, ts(0), "view", 5L), (2L, ts(1), "purchase", 6L)     // one session: view>purchase
    ).toDF("user_id", "ts", "event_type", "event_id")
    val got = graft.operators.TimeSeries.sessionPaths(ev, "user_id", "ts", "event_id",
      "event_type", gapMs = 600000L, k = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    // user 1's bursts are 4990 s apart > the 600 s gap → two view>click sessions
    assert(got == Seq("view>click" -> 2L, "view>purchase" -> 1L))
  }

  test("triangleCount: complete graph, triangle-free path, duplicate/reversed edges") {
    def tri(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
      val r = Graph.triangleCount(edges.toDF("src", "dst"), "src", "dst").head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // K4: C(4,3) = 4 triangles over 6 edges
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(tri(k4) == (4L, 6L, 4L))
    // path graph: no triangles
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == (4L, 3L, 0L))
    // one triangle given redundantly (reversed + duplicate edges + self-loop)
    assert(tri(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L), (3L, 3L))) == (3L, 3L, 1L))
  }

  test("poissonBootstrapCi brackets the point mean, is deterministic, and weights average ~1") {
    import graft.operators.DataOps
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val ci = DataOps.poissonBootstrapCi(docs, "source", "doc_id", col("n_chars"),
      replicas = 50, seed = 7L).collect()
    assert(ci.nonEmpty)
    ci.foreach { r =>
      val (mean, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(lo < hi, r.toString)
      assert(lo <= mean && mean <= hi, s"CI must bracket the point mean: $r")
      // sanity bound only: sf0.001 sources hold as few as ~25 rows,
      // where a 95% CI legitimately spans ~half the mean — the real
      // width check is the oracle hash-match on the full chain
      assert((hi - lo) / mean < 1.0, s"implausibly wide CI: $r")
    }
    val ci2 = DataOps.poissonBootstrapCi(docs, "source", "doc_id", col("n_chars"),
      replicas = 50, seed = 7L).collect()
    assert(ci.map(_.toString).toSeq == ci2.map(_.toString).toSeq)
    // the hex-threshold weights really are Poisson(1): mean weight ~ 1
    import spark.implicits._
    val ids = (1L to 4000L).toDF("id")
    val bucket = substring(md5(concat(col("id").cast("string"), lit(":0:7"))), 1, 8)
    val w = DataOps.poissonCdf.zipWithIndex.foldRight(lit(DataOps.poissonCdf.length): org.apache.spark.sql.Column) {
      case ((t, k), acc) => when(bucket < lit(t), k).otherwise(acc)
    }
    val mw = ids.select(avg(w).as("mw")).head.getDouble(0)
    assert(mw > 0.9 && mw < 1.1, s"mean Poisson weight drifted: $mw")
  }

  test("theilSenSlope shrugs off a planted outlier where OLS cannot; groups isolated") {
    import graft.operators.TimeSeries
    import spark.implicits._
    // y = 2x with one wild point: 6 of the 10 pairwise slopes are
    // exactly 2, so the median IS 2.0 — an OLS fit lands near 200.
    val pts = Seq(
      ("s", 0L, 0L), ("s", 1L, 2L), ("s", 2L, 4L), ("s", 3L, 6L), ("s", 4L, 1000L),
      ("t", 0L, 10L), ("t", 1L, 7L), ("t", 2L, 4L)).toDF("g", "x", "y")
    val got = TimeSeries.theilSenSlope(pts, "g", "x", "y")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("s") == ((10L, 2.0)), got.toString)
    assert(got("t") == ((3L, -3.0)), got.toString)
  }

  test("funnel enforces stage order; transitionMatrix conditions on the from-state") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val ev = Seq(
      (1L, ts(1), "view", 101L), (1L, ts(2), "click", 102L), (1L, ts(3), "purchase", 103L),
      (2L, ts(1), "purchase", 201L), (2L, ts(2), "view", 202L), (2L, ts(3), "click", 203L),
      (3L, ts(1), "click", 301L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val f = graft.operators.TimeSeries.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).head()
    // user 1 converts fully; user 2's purchase PRECEDES its view→click
    // chain so it must not count; user 3 clicked but never viewed.
    assert(f.getLong(0) == 3L && f.getLong(1) == 2L && f.getLong(2) == 2L && f.getLong(3) == 1L)
    assert(f.getDouble(6) == 0.3333)  // rate_purchase = 1/3
    val tm = graft.operators.TimeSeries.transitionMatrix(ev, "user_id",
      Seq(col("ts"), col("event_id")), "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(tm(("view", "click")) == (2L, 1.0))       // both users 1 and 2
    assert(tm(("click", "purchase")) == (1L, 1.0))
    assert(tm(("purchase", "view")) == (1L, 1.0))
    assert(tm.size == 3)                              // user 3 has no transitions
  }

  test("reliabilityDiagram: hand-computed bins, ECE, and the conf=1.0 edge bin") {
    import graft.operators.DataOps
    // bin 8: overconfident (conf .85, acc .5); bin 2: near-calibrated
    // (conf .25, acc .2); bin 9: perfect at the conf=1.0 edge (must
    // clamp into the last bin, not bin 10)
    val rows =
      Seq.fill(5)((0.85, 1)) ++ Seq.fill(5)((0.85, 0)) ++
        Seq.fill(2)((0.25, 1)) ++ Seq.fill(8)((0.25, 0)) ++
        Seq.fill(5)((1.0, 1))
    val df = rows.toDF("c", "y")
    val got = DataOps.reliabilityDiagram(df, col("c"), col("y") === 1, bins = 10)
      .orderBy("bin").collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(2, 8, 9))
    val byBin = got.map(r => r.getInt(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(byBin(8) == ((10L, 0.85, 0.5, 0.35)))
    assert(byBin(2) == ((10L, 0.25, 0.2, 0.05)))
    assert(byBin(9) == ((5L, 1.0, 1.0, 0.0)))
    // ECE = (10*0.35 + 10*0.05 + 5*0) / 25
    got.foreach(r => assert(r.getDouble(5) == 0.16, r.toString))
  }

  test("sourceOverlap counts shared fingerprints per source pair with pairwise Jaccard") {
    val rows = Seq(
      ("s1", "alpha"), ("s1", "beta"), ("s1", "gamma"),
      ("s2", "beta"), ("s2", "gamma"), ("s2", "delta"),
      ("s3", "zeta"), ("s3", "zeta")  // duplicate content collapses in the distinct
    ).toDF("source", "text")
    val got = graft.operators.DataOps.sourceOverlap(rows, "source", md5(col("text")))
      .orderBy("source_a", "source_b").collect()
    // only (s1, s2) share content: {beta, gamma} of 3 and 3 → J = 2/4
    assert(got.length == 1)
    val r = got(0)
    assert(r.getString(0) == "s1" && r.getString(1) == "s2" && r.getLong(2) == 2L)
    assert(r.getLong(3) == 3L && r.getLong(4) == 3L && math.abs(r.getDouble(5) - 0.5) < 1e-9)
  }

  test("robustOutliers: the whale is flagged, the cluster is not, MAD=0 flags exact deviants only") {
    val rows = Seq(
      ("a", 1L, 10.0), ("a", 2L, 11.0), ("a", 3L, 9.0), ("a", 4L, 10.5), ("a", 5L, 1000.0),
      ("b", 6L, 5.0), ("b", 7L, 5.0), ("b", 8L, 5.0), ("b", 9L, 99.0)
    ).toDF("g", "id", "v")
    val got = graft.operators.DataOps.robustOutliers(rows, "g", "id", "v", k = 3.0)
      .orderBy("id").collect().map(r => r.getLong(1) -> r.getBoolean(5)).toMap
    assert(got(5L))                                  // the whale
    assert(!got(1L) && !got(2L) && !got(3L) && !got(4L))
    assert(got(9L) && !got(6L))                      // MAD=0 group: only the deviant
  }

  test("quantileNorm: percent_rank spans [0,1] per group with deterministic tiebreak") {
    val rows = Seq(("g", 1L, 10.0), ("g", 2L, 20.0), ("g", 3L, 30.0), ("g", 4L, 20.0),
      ("h", 5L, 7.0)).toDF("s", "id", "v")
    val got = graft.operators.DataOps.quantileNorm(rows, "s", "id", "v")
      .orderBy("id").collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // order in g: 10(1) < 20,id2(2) < 20,id4(3) < 30(4) → ranks 0, 1/3, 2/3, 1
    assert(got(1L) == 0.0 && math.abs(got(2L) - 0.333333) < 1e-6)
    assert(math.abs(got(4L) - 0.666667) < 1e-6 && got(3L) == 1.0)
    assert(got(5L) == 0.0)  // single-row group
  }

  test("textRankKeywords ranks the co-occurrence hub first, conserves mass, filters non-content tokens") {
    // alpha neighbors {beta, gamma, delta}; beta/gamma have 2; delta 1.
    // "x" and "42" fail the [a-z]{3,} content filter; "tiny" has no
    // co-occurring partner surviving the filter so it never enters.
    val docs = Seq(
      "alpha beta x 42", "beta gamma", "gamma alpha", "alpha delta", "tiny x"
    ).toDF("text")
    val got = graft.operators.TextRank.textRankKeywords(docs, "text", k = 10)
      .as[(String, Double)].collect()
    assert(got.map(_._1).toSet == Set("alpha", "beta", "gamma", "delta"))
    assert(got.head._1 == "alpha", s"hub should rank first, got ${got.toSeq}")
    assert(math.abs(got.map(_._2).sum - 1.0) < 1e-4)  // undirected graph: no dangling leak
    assert(got.map(_._2).sorted.reverse.toSeq == got.map(_._2).toSeq)  // sorted by rank desc
  }

  test("ewmaLast closed form equals the sequential fold") {
    val ev = Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 5.0), (1L, 4L, 40.0), (2L, 1L, 7.0))
      .toDF("k", "o", "v")
    val got = graft.operators.TimeSeries.ewmaLast(ev, "k", Seq(col("o")), "v", alpha = 0.5)
      .orderBy("k").collect()
    def fold(xs: Seq[Double]): Double = xs.reduceLeft((e, x) => 0.5 * x + 0.5 * e)
    assert(got(0).getLong(1) == 4L && math.abs(got(0).getDouble(2) - fold(Seq(10, 20, 5, 40))) < 1e-3)
    assert(got(1).getLong(1) == 1L && math.abs(got(1).getDouble(2) - 7.0) < 1e-9)  // single row: ewma = x1
  }

  test("pageRank conserves mass, ranks hubs above leaves, matches scalar reference") {
    // 1 and 2 both point at 3; 3 points at 1 and 4. Vertex 4 has no
    // out-edges, so it is dangling: its rank must redistribute
    // uniformly each round instead of leaking.
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, "src", "dst", iters = 3, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    // Mass conservation: ranks always sum to 1 (dangling mass is
    // redistributed, not dropped).
    assert(math.abs(got.values.sum - 1.0) < 1e-4)
    // 3 has two in-edges of full out-weight; it must outrank everyone.
    assert(got(3L) > got(1L) && got(3L) > got(2L) && got(3L) > got(4L))
    // Scalar reference: same fixed iteration in plain Scala.
    val n = 4
    val out = Map(1L -> Seq(3L), 2L -> Seq(3L), 3L -> Seq(1L, 4L))
    var r = Seq(1L, 2L, 3L, 4L).map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 3) {
      val dm = r.collect { case (k, v) if !out.contains(k) => v }.sum
      val contribs = out.toSeq.flatMap { case (s, ds) => ds.map(_ -> r(s) / ds.size) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      r = r.keys.map(k => k ->
        (0.15 / n + 0.85 * (contribs.getOrElse(k, 0.0) + dm / n))).toMap
    }
    for ((k, v) <- r) assert(math.abs(got(k) - v) < 1e-6, s"vertex $k: ${got(k)} vs $v")
  }

  test("fimSplit: spans are non-empty, partition the doc, and are deterministic") {
    val docs = Seq((1L, "a b c"), (2L, "one two three four five six"), (3L, "x y"))
      .toDF("doc_id", "text")
    val r = Curation.fimSplit(docs, "doc_id", "text").collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(!r.contains(3L)) // 2-word docs can't satisfy three non-empty spans
    for ((_, row) <- r) {
      val (p, m, s2) = (row.getAs[Long]("n_prefix"), row.getAs[Long]("n_middle"),
        row.getAs[Long]("n_suffix"))
      assert(p >= 1 && m >= 1 && s2 >= 1)
      assert(p + m + s2 == row.getAs[Long]("n_words"))
    }
    // 3-word doc has exactly one legal split: (1, 1, 1)
    assert(r(1L).getAs[Long]("n_prefix") == 1L && r(1L).getAs[Long]("n_middle") == 1L)
    val again = Curation.fimSplit(docs, "doc_id", "text").collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("middle_fp")).toMap
    assert(again(2L) == r(2L).getAs[String]("middle_fp"))
  }

  test("preferencePairs: best-vs-worst per cell, singleton cells dropped") {
    val docs = Seq(
      (1L, "en", 100L), (2L, "en", 50L), (3L, "en", 75L), // likely same or split buckets
      (10L, "de", 10L)) // singleton stratum cell -> no pair
      .toDF("doc_id", "lang", "n_chars")
    val r = Curation.preferencePairs(docs, "lang", "doc_id", col("n_chars"), buckets = 1)
      .collect().map(x => x.getAs[String]("stratum") -> x).toMap
    assert(!r.contains("de"))
    val en = r("en")
    assert(en.getAs[Long]("chosen_id") == 1L && en.getAs[Long]("rejected_id") == 2L)
    assert(en.getAs[Long]("margin") == 50L)
  }

  test("fleschStats: hand-counted sentences/words/vowel-group syllables") {
    val df = Seq("Hello world. This is fine.").toDF("t")
    val r = df.select(Curation.fleschStats(col("t")).as("f")).select("f.*").collect().head
    assert(r.getAs[Long]("n_sents") == 2L)
    assert(r.getAs[Long]("n_words") == 5L)
    // he-llo(e,o) world(o) this(i) is(i) f-i-ne(i,e) = 7 vowel groups
    assert(r.getAs[Long]("n_syllables") == 7L)
    // 206.835 - 1.015*(5/2) - 84.6*(7/5) = 85.8575
    assert(r.getAs[Double]("flesch") == 85.8575)
    // no terminator: the fragment counts as one sentence, not zero
    val frag = Seq("just words no stop").toDF("t")
    assert(frag.select(Curation.fleschStats(col("t")).as("f"))
      .select("f.n_sents").collect().head.getLong(0) == 1L)
  }

  test("spanCorrupt: mask set matches the hash rule, sentinels numbered in order") {
    // recompute the expected masked blocks with the same md5 rule
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val text = (1 to 30).map(i => s"w$i").mkString(" ") // 30 tokens, 10 blocks
    val docs = Seq((42L, text)).toDF("doc_id", "text")
    val expectedMasked = (0 until 10).filter(b => md5hex(s"42:$b:17").take(6) < "333333")
    val r = Curation.spanCorrupt(docs, "doc_id", "text").collect().head
    assert(r.getAs[Long]("n_tokens") == 30L)
    assert(r.getAs[Long]("n_spans") == expectedMasked.size.toLong)
    assert(r.getAs[Long]("n_masked") == 3L * expectedMasked.size)
    val head = r.getAs[String]("corrupted_head")
    if (expectedMasked.nonEmpty) {
      assert(head.contains("<extra_id_0>"))
      // the first masked block's first original token is gone
      assert(!head.split(" ").contains(s"w${expectedMasked.head * 3 + 1}"))
    }
    // deterministic across runs
    val again = Curation.spanCorrupt(docs, "doc_id", "text").collect().head
    assert(again.getAs[String]("corrupted_head") == head)
  }
}
