package graft

import graft.functions.{GraftExtensions, RollingHash}
import graft.ops.{MultimodalOps, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing + native codegen expression. */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("media table: binary payload matches text length; metadata typed") {
    val m = MultimodalOps.mediaTable(spark, sf)
    val bad = m.join(graft.core.Tables.documents(spark, sf),
        m("media_id") === col("doc_id"))
      .filter(length(col("content")) =!= col("n_chars"))
    assert(bad.count() == 0) // ASCII text: bytes == chars
    assert(m.schema("content").dataType.typeName == "binary")
    assert(m.schema("meta").dataType.typeName == "struct")
  }

  test("batched decode is deterministic and batch-size independent") {
    val a = MultimodalOps.extractFeatures(spark, sf, batchSize = 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    val b = MultimodalOps.extractFeatures(spark, sf, batchSize = 1)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, v) =>
      assert(v.size == MultimodalOps.FeatureDim)
      assert(v == b(id), s"media $id")
    }
  }

  test("frame sampling: counts match the arithmetic; frames are <=32 bytes") {
    val frames = MultimodalOps.sampleFrames(spark, sf)
    assert(frames.filter(length(col("frame")) > 32).count() == 0)
    val counted = frames.groupBy("media_id").agg(count(lit(1)).as("actual"))
    val expected = MultimodalOps.frameCounts(spark, sf)
    val bad = expected.join(counted, "media_id")
      .filter(col("actual") =!= col("n_sampled"))
    assert(bad.count() == 0)
  }

  test("native RollingHash == HOF formulation == SQL-registered function") {
    val docs = graft.core.Tables.documents(spark, sf).filter(col("doc_id") < 30)
    GraftExtensions.register(spark)
    val three = docs.select(
      TextOps.rollingHash(col("text")).as("hof"),
      RollingHash(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("native"),
      expr("graft_rolling_hash(trim(regexp_replace(lower(text), '\\\\s+', ' ')))").as("sqlfn"))
    assert(three.filter(col("hof") =!= col("native") || col("hof") =!= col("sqlfn")).count() == 0)
  }
}
