package graft

import org.apache.spark.sql.functions._

import graft.functions.TypeNormalize
import graft.operators.{Distill, Rialto}

/** Semantics mirror /root/reference/rialto_airflow/test/distiller tests. */
class DistillSpec extends SparkSpec {
  import spark.implicits._

  test("firstValid takes precedence order; validYear rejects future years") {
    val df = Seq(("2030", "1999"), ("2001", "1999")).toDF("a", "b")
    val out = df.select(
      Distill.firstValid(
        Distill.validYear(col("a"), 2026),
        Distill.validYear(col("b"), 2026)
      ).as("y")
    ).collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1999L, 2001L))
  }

  test("positiveNumber rejects negatives and non-numeric") {
    val df = Seq("5", "-3", "abc").toDF("x")
    val out = df.select(Distill.positiveNumber(col("x")).as("n")).collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(Some(5L), None, None))
  }

  test("jsonRule extracts nested paths from JSON strings") {
    val df = Seq("""{"a":{"b":[7,8]}}""").toDF("j")
    val out = df.select(
      Distill.jsonRule(col("j"), "a.b[1]").as("x"),
      Distill.jsonRule(col("j"), "missing").as("m")
    ).collect()(0)
    assert(out.getString(0) == "8" && out.isNullAt(1))
  }

  test("type normalization: mapping hit, capitalize fallback, sorted set") {
    val df = Seq(Seq("journal article", "erratum", "zine", "REVIEW")).toDF("t")
    val out = df.select(TypeNormalize.normalizeTypes(col("t")).as("n")).collect()(0).getSeq[String](0)
    assert(out == Seq("Article", "Correction/Retraction", "Zine"))
  }

  test("apc rule chain matches distiller/apc.py decision table") {
    val df = Seq(
      (Some(1200L), "closed"),  // located but closed -> 0
      (Some(1200L), "gold"),    // located -> located
      (None, "diamond"),        // -> 0
      (None, "gold"),           // -> 2450
      (None, "hybrid"),         // -> 3600
      (None, "bronze")          // -> null
    ).toDF("cand", "oa")
    val out = df.select(Rialto.apc(col("cand"), col("oa")).as("apc")).collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(Some(0L), Some(1200L), Some(0L), Some(2450L), Some(3600L), None))
  }

  test("preprint forces apc 0") {
    val df = Seq((Some(999L), "gold")).toDF("cand", "oa")
    val out = df.select(Rialto.apc(col("cand"), col("oa"), lit(true)).as("apc")).collect()(0).getLong(0)
    assert(out == 0L)
  }
}
