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

  // ---------------------------------------------------- pluggable decoders

  /** Hand-assembled RIFF/WAVE, 16-bit PCM mono: 4 samples. */
  private def wavBytes(samples: Seq[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)          // PCM, mono
      .putInt(8000).putInt(16000)       // sample rate, byte rate
      .putShort(2).putShort(16)         // block align, bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => buf.putShort(s))
    buf.array()
  }

  /** Hand-assembled uncompressed 24-bit BMP, w×h pixels of one BGR color. */
  private def bmpBytes(w: Int, h: Int, bgr: (Int, Int, Int)): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val total = 54 + stride * h
    val buf = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("BM".getBytes("US-ASCII")).putInt(total)
      .putInt(0).putInt(54)             // reserved, pixel offset
      .putInt(40).putInt(w).putInt(h)   // BITMAPINFOHEADER
      .putShort(1).putShort(24)         // planes, bpp
      .putInt(0).putInt(stride * h)     // BI_RGB, image size
      .putInt(0).putInt(0).putInt(0).putInt(0)
    for (_ <- 0 until h; c <- 0 until stride)
      buf.put(if (c < w * 3) (c % 3 match {
        case 0 => bgr._1; case 1 => bgr._2; case _ => bgr._3
      }).toByte else 0.toByte)
    buf.array()
  }

  test("WAV PCM decoder really parses: per-bucket |sample| sums, exact") {
    import graft.ops.MediaDecoders
    val samples = Seq[Short](16384, -16384, 32767, -32768, 0, 8192, -8192, 4096, 2048)
    val feats = MediaDecoders.decode(wavBytes(samples))
    assert(feats.length == MultimodalOps.FeatureDim)
    // bucket b = Σ |s_i|/32768 over i ≡ b (mod 8): 9 samples wrap once.
    val expected = Array.tabulate(8)(b =>
      samples.zipWithIndex.collect { case (s, i) if i % 8 == b =>
        math.abs(s.toInt).toFloat / 32768f }.sum)
    assert(feats.toSeq == expected.toSeq)
    // corrupt data-chunk size (offset 40: 12 + fmt(8+16) + "data".length)
    // overruns the payload → declined, byte-stats fallback takes over
    val broken = wavBytes(samples); broken(40) = 0x7f
    assert(MediaDecoders.WavPcmDecoder.decode(broken).isEmpty)
    assert(MediaDecoders.decode(broken).toSeq ==
      MediaDecoders.ByteStatsDecoder.decode(broken).get.toSeq)
  }

  test("BMP decoder really parses: channel means + dimensions, exact") {
    import graft.ops.MediaDecoders
    val feats = MediaDecoders.decode(bmpBytes(3, 2, (10, 200, 45)))
    assert(feats(0) == 10f && feats(1) == 200f && feats(2) == 45f) // B,G,R means
    assert(feats(3) == 6f && feats(4) == 3f && feats(5) == 2f)     // n, w, h
    // ASCII text starting with "BM" must NOT misparse (size check fails)
    val impostor = "BMarvolo Gaunt's ring was a horcrux".getBytes("UTF-8")
    assert(MediaDecoders.BmpDecoder.decode(impostor).isEmpty)
    assert(MediaDecoders.decode(impostor).toSeq ==
      MediaDecoders.ByteStatsDecoder.decode(impostor).get.toSeq) // fallback leg
  }

  test("decoder mux selects by container and falls back for opaque bytes") {
    import graft.ops.MediaDecoders
    val wav = wavBytes(Seq[Short](1000, -1000))
    val bmp = bmpBytes(2, 2, (1, 2, 3))
    val txt = "plain opaque bytes".getBytes("UTF-8")
    assert(MediaDecoders.decode(wav)(0) == 1000f / 32768f) // WAV leg
    assert(MediaDecoders.decode(bmp)(3) == 4f)             // BMP leg (n px)
    assert(MediaDecoders.decode(txt).toSeq == MediaDecoders.ByteStatsDecoder.decode(txt).get.toSeq)
  }

  test("shard manifest: complete partition, contiguous id ranges, boundary rule") {
    val target = 4096L
    val m = graft.ops.MultimodalOps.shardManifest(spark, sf, target).collect()
    val total = graft.core.Tables.documents(spark, sf).count()
    assert(m.map(_.getAs[Long]("n_items")).sum == total, "every item lands in a shard")
    m.groupBy(_.getString(0)).foreach { case (fmt, shards) =>
      val s = shards.sortBy(_.getAs[Long]("shard_id"))
      // shard ids are dense from 0
      assert(s.map(_.getAs[Long]("shard_id")).sameElements(s.indices.map(_.toLong)), fmt)
      // id ranges are disjoint and ordered — a loader can range-scan each
      s.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_id") < b.getAs[Long]("first_id"), fmt)
        case _ =>
      }
      // greedy boundary rule: a new shard opens only once the running byte
      // total has crossed the budget, so the cumulative bytes through
      // shard k reach at least (k+1)*target for every non-final shard.
      val cum = s.map(_.getAs[Long]("total_bytes")).scanLeft(0L)(_ + _).drop(1)
      s.init.zip(cum.init).foreach { case (sh, c) =>
        assert(c >= (sh.getAs[Long]("shard_id") + 1) * target,
          s"$fmt shard ${sh.getAs[Long]("shard_id")} closed early at $c bytes")
      }
    }
  }

  test("phash near-dup: banded candidates recover exactly the brute-force pairs") {
    val feats = graft.ops.MultimodalOps.extractFeatures(spark, sf, maxId = 300)
      .select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toLong))
    def sigOf(bins: Seq[Long]): Long = {
      val total = bins.sum
      bins.zipWithIndex.map { case (b, j) => if (8 * b > total) 1L << j else 0L }.sum
    }
    val sigs = feats.map { case (id, bins) => id -> sigOf(bins) }
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 1
    } yield (ia, ib)).toSet
    val got = graft.ops.MultimodalOps.phashNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, "banding must lose no hamming<=1 pair (pigeonhole) and add none")
    assert(brute.nonEmpty, "corpus should produce at least one near-dup pair")
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

  test("vad segments: run-length invariants hold against a plain Scala replay") {
    val rows = graft.ops.MultimodalOps.vadSegments(spark, sf).collect()
    val texts = graft.core.Tables.documents(spark, sf)
      .filter(col("doc_id") < 100 && length(col("text")) > 0)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val text = texts(r.getAs[Long]("media_id"))
      val acts = text.grouped(32).map(b =>
        if (b.map(_.toInt).sum >= 2560) 1 else 0).toSeq
      val runs = acts.foldLeft(List.empty[Int]) {
        case (h :: t, 1) if h > 0 => (h + 1) :: t
        case (acc, 1) => 1 :: acc
        case (acc, _) => 0 :: acc
      }.filter(_ > 0)
      assert(r.getAs[Long]("n_frames") == acts.length, "frame count")
      assert(r.getAs[Long]("n_active") == acts.sum, "active count")
      assert(r.getAs[Long]("n_segments") == runs.length, "segment count")
      assert(r.getAs[Long]("max_run") == (if (runs.isEmpty) 0 else runs.max), "max run")
    }
  }
}
