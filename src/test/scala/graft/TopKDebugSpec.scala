package graft

import org.apache.spark.sql.functions._

import graft.operators.TopK

class TopKSmallSpec extends SparkSpec {
  import spark.implicits._

  test("topk keeps ties and exact winners across partitions") {
    val df = Seq(
      (1L, 10L, 5.0), (1L, 11L, 7.0), (1L, 12L, 7.0), (1L, 13L, 1.0),
      (2L, 20L, 3.0)
    ).toDF("k", "id", "v").repartition(3)
    val out = TopK.perKey(df, Seq("k"), struct(-col("v"), col("id")), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set((1L, 11L, 7.0), (1L, 12L, 7.0), (2L, 20L, 3.0)), s"got $out")
  }
}
