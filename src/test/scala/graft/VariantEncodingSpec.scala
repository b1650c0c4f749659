package graft
import org.apache.spark.sql.functions._

/** Spark's VARIANT string path round-trips through the JVM default
  * charset: without -Dfile.encoding=UTF-8 (pinned in build.sbt — Java
  * 17 containers without LANG default to US-ASCII) every multi-byte
  * UTF-8 char in a variant-extracted string becomes U+FFFD while
  * get_json_object stays correct. This pins the working configuration
  * so a build.sbt regression fails loudly (the pubmed abstract
  * distiller rides the variant path — see DistillerFixturesSpec).
  */
class VariantEncodingSpec extends SparkSpec {
  import spark.implicits._
  test("variant string extraction preserves multi-byte UTF-8") {
    val df = Seq("{\"a\":\"x≥y\"}").toDF("j")
    val r = df.select(
      try_variant_get(try_parse_json(col("j")), "$.a", "string").as("v"),
      get_json_object(col("j"), "$.a").as("g")).collect()(0)
    assert(r.getString(0) == "x≥y")
    assert(r.getString(1) == "x≥y")
  }
}
