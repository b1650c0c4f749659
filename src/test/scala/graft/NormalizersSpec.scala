package graft

import org.apache.spark.sql.functions._

import graft.functions.Normalizers._

/** Semantics mirror /root/reference/rialto_airflow/test/test_utils.py. */
class NormalizersSpec extends SparkSpec {
  import spark.implicits._

  private def run(c: org.apache.spark.sql.Column, input: String): Any =
    Seq(input).toDF("x").select(c.as("y")).collect()(0).get(0)

  private def runNull(c: org.apache.spark.sql.Column): Any =
    Seq(Option.empty[String]).toDF("x").select(c.as("y")).collect()(0).get(0)

  test("normalizeDoi extracts from junk and rewrites arXiv ids") {
    assert(run(normalizeDoi(col("x")), "https://doi.org/10.1234/abc.123") == "10.1234/abc.123")
    assert(run(normalizeDoi(col("x")), "10.1234/abc.123") == "10.1234/abc.123")
    assert(run(normalizeDoi(col("x")), "arXiv:2202.01037") == "10.48550/arxiv.2202.01037")
    assert(run(normalizeDoi(col("x")), "no doi here") == null)
    assert(run(normalizeDoi(col("x")), "   ") == null)
    assert(run(normalizeDoi(col("x")), "10.1\"quoted\"") == null)
    assert(runNull(normalizeDoi(col("x"))) == null)
  }

  test("normalizeDoi dirty inputs match reference test_normalize_doi") {
    // test_utils.py:39-86 inputs, verbatim
    assert(run(normalizeDoi(col("x")), "10.1103/PhysRevLett.96.07390") == "10.1103/physrevlett.96.07390")
    assert(run(normalizeDoi(col("x")), " 10.1234/5678 ") == "10.1234/5678")
    assert(run(normalizeDoi(col("x")), " doi: 10.1234/5678 ") == "10.1234/5678")
    assert(run(normalizeDoi(col("x")), "doi:10.1234/ 56 78") == "10.1234/5678")
    assert(run(normalizeDoi(col("x")), "junkstuff7-710.1016.12.31/nature.<S0735>-1097(98)2000/12/31/34:7-7")
      == "10.1016.12.31/nature.<s0735>-1097(98)2000/12/31/34:7-7")
    assert(run(normalizeDoi(col("x")), "07390710.1103/physrevlett.96.073907") == "10.1103/physrevlett.96.073907")
    assert(run(normalizeDoi(col("x")), "fooooooo10.1016/j.juro.2018.10.006") == "10.1016/j.juro.2018.10.006")
    assert(run(normalizeDoi(col("x")), "11.0000/this.doi.goes.to.11") == null)
    assert(run(normalizeDoi(col("x")), "https://doi.org/10.48550/arXiv.2202.01037") == "10.48550/arxiv.2202.01037")
    assert(run(normalizeDoi(col("x")), "10.1007/978-3-030-46640-4\\_21") == "10.1007/978-3-030-46640-4_21")
    assert(run(normalizeDoi(col("x")), "10.1562/0031-8655(2004)79&lt;76:aocrtt&gt;2.0.co;2") == null)
    assert(run(normalizeDoi(col("x")), "10.1562/0031-8655(2004)\"79") == null)
  }

  test("normalizePmid strips url and medline prefix") {
    assert(run(normalizePmid(col("x")), "https://pubmed.ncbi.nlm.nih.gov/123456") == "123456")
    assert(run(normalizePmid(col("x")), "MEDLINE:123456") == "123456")
    assert(run(normalizePmid(col("x")), " 123456 ") == "123456")
  }

  test("normalizeWosId strips WOS: and nulls MEDLINE:") {
    assert(run(normalizeWosId(col("x")), "WOS:001008232900698") == "001008232900698")
    assert(run(normalizeWosId(col("x")), "001008232900698") == "001008232900698")
    assert(run(normalizeWosId(col("x")), "MEDLINE:29780978") == null)
    assert(run(normalizeWosId(col("x")), "  ") == null)
  }

  test("normalizeOrcid lowercases and strips orcid.org urls") {
    assert(run(normalizeOrcid(col("x")), "https://orcid.org/0000-0002-1825-009X") == "0000-0002-1825-009x")
    assert(run(normalizeOrcid(col("x")), "https://sandbox.orcid.org/0000-0002-1825-0097") == "0000-0002-1825-0097")
    assert(run(normalizeOrcid(col("x")), "0000-0002-1825-0097") == "0000-0002-1825-0097")
  }

  test("piped joins dropping nulls; joinKeys skips missing") {
    val df = Seq((Seq(Some("a"), None, Some("b")), Some("x"), Option.empty[String])).toDF("arr", "l", "r")
    val out = df.select(piped(col("arr")).as("p"), joinKeys(col("l"), col("r")).as("j")).collect()(0)
    assert(out.getString(0) == "a|b")
    assert(out.getString(1) == "x")
  }

  test("normalizeFunderName drops parenthetical acronym and lowercases") {
    val r = run(normalizeFunderName(col("x")), "National Institutes of Health (NIH)")
    assert(r == "national institutes of health")
  }

  test("soundex matches the census reference codes (h/w transparency, run collapse)") {
    val cases = Seq(
      "Robert" -> "R163", "Rupert" -> "R163",     // classic pair
      "Ashcraft" -> "A261", "Ashcroft" -> "A261", // h transparent between s/c
      "Tymczak" -> "T522",                        // cz collapse, y separator
      "Pfister" -> "P236",                        // pf collapse incl. first letter
      "Honeyman" -> "H555",                       // h/w-initial: nothing dropped
      "Euler" -> "E460",                          // vowel-initial, zero padding
      "smith" -> "S530", "smyth" -> "S530",       // vowel typo, same block
      "a-b c1" -> "A120",                         // non-letters stripped
      "" -> "", "##" -> "")                       // degenerate inputs
    for ((in, want) <- cases)
      assert(run(graft.functions.Phonetic.soundex(col("x")), in) == want, s"soundex($in)")
  }
}
