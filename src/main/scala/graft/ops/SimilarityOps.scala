package graft.ops

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-dim) —
  * the ANN extension surface mandated by BASELINE.json.
  *
  * Spark-first design: dot products via `zip_with` + `aggregate` higher-order
  * functions (whole-stage codegen, no UDF); floats cast to double BEFORE any
  * arithmetic so results are bit-comparable with the DuckDB oracle; the
  * scale path is sign-random-projection LSH — bucket keys turn the n² search
  * into an equi-join, which is the only shape that survives 100 TB.
  */
object SimilarityOps {

  /** embedding → double[] (float arithmetic would diverge from the oracle). */
  private def vec(c: Column): Column = c.cast("array<double>")

  /** dot(a, b) — native codegen'd expression (graft.functions.DotProduct):
    * sequential fused multiply-add in index order, the same order DuckDB's
    * list_sum uses, so doubles match to the ulp. */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct(a, b)

  /** Higher-order-function twin (zip_with + aggregate), kept for the spec
    * cross-check against the native expression — identical fold order. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** Rows (vec_id, label, v, nrm) with the norm precomputed once. */
  private def normed(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), vec(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))

  /** Brute-force cosine top-k for one query vector (the exact baseline):
    * broadcast the single query row, one scan over the corpus, top-k via
    * TakeOrderedAndProject — no shuffle except the final k rows. */
  def cosineTopK(spark: SparkSession, sfDir: String, queryId: Long = 0L, k: Int = 10): DataFrame = {
    val e = normed(spark, sfDir)
    val q = e.filter(col("vec_id") === queryId)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    e.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 6).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** Hybrid retrieval via reciprocal-rank fusion (sim_hybrid_rrf) — the
    * pattern production search actually ships: a LEXICAL arm (BM25 over
    * the listing-pruned postings index) and a VECTOR arm (cosine top-k)
    * fused by RRF, score = Σ 1/(60 + rank) in exact integer micros
    * (truncating div — no float channel). Ranks come from row_number
    * over each arm's ≤20-row result (the rq32 bounded-domain window
    * rule); the arms themselves keep their at-scale plans, fusion adds
    * a 30-row full-outer join. vec_id aligns with doc_id by fixture
    * construction, which is exactly the shared-key layout a real corpus
    * gives its text and embedding tables. */
  def hybridRrf(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    val wB = Window.orderBy(col("score_micro").desc, col("doc_id").asc)
    val lex = graft.ops.TextOps.bm25TopK(spark, sfDir)
      .withColumn("r", row_number().over(wB))
      .select(col("doc_id"), col("r").as("lex_rank"))
    val wV = Window.orderBy(col("cosine").desc, col("vec_id").asc)
    val vec = cosineTopK(spark, sfDir)
      .withColumn("r", row_number().over(wV))
      .select(col("vec_id").as("doc_id"), col("r").as("vec_rank"))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(0)).as("vec_rank"),
        (coalesce(expr("1000000 div (60 + lex_rank)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + vec_rank)"), lit(0L)))
          .cast("long").as("rrf_micro"))
      .orderBy(desc("rrf_micro"), col("doc_id"))
      .limit(k)
  }

  /** Matryoshka truncation audit (sim_mrl_topk) — the eval you run BEFORE
    * shipping dimension-truncated embeddings (MRL-style): retrieve top-k
    * with only the first `dims` coordinates (truncated norms, same exact
    * arithmetic) and report that ranking alongside its overlap with the
    * full-dimension exact top-k. The overlap integer rides the hash
    * channel, so the oracle — which replays BOTH arms in SQL (list slice
    * + the same fold-order dot product) — certifies the truncated
    * ranking AND the measured recall, not just row shapes. Shape: two
    * corpus scans, each ending in TakeOrderedAndProject, and a k×k
    * broadcast join for the overlap; at 100 TB the truncated arm is the
    * one you'd serve from the IVF/PQ index (truncation composes with
    * any of the sim_ann_* paths — same column, fewer coordinates). */
  def mrlTopK(spark: SparkSession, sfDir: String, queryId: Long = 0L,
              dims: Int = 16, k: Int = 10): DataFrame = {
    val e = normed(spark, sfDir)
    val t = e.select(col("vec_id"), col("label"),
        slice(col("v"), 1, dims).as("tv"))
      .withColumn("tn", norm(col("tv")))
    val fullQ = e.filter(col("vec_id") === queryId)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    val truncQ = t.filter(col("vec_id") === queryId)
      .select(col("tv").as("tqv"), col("tn").as("tqn"))
    val fullTop = e.filter(col("vec_id") =!= queryId).crossJoin(broadcast(fullQ))
      .select(col("vec_id"),
        round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 6).as("c"))
      .orderBy(desc("c"), asc("vec_id")).limit(k)
      .select("vec_id")
    val truncTop = t.filter(col("vec_id") =!= queryId).crossJoin(broadcast(truncQ))
      .select(col("vec_id"), col("label"),
        round(dot(col("tv"), col("tqv")) / (col("tn") * col("tqn")), 6)
          .as("cosine_trunc"))
      .orderBy(desc("cosine_trunc"), asc("vec_id")).limit(k)
    val ov = truncTop.join(fullTop, "vec_id")
      .agg(count(lit(1)).as(s"overlap_at_$k"))
    truncTop.crossJoin(broadcast(ov))
      .orderBy(desc("cosine_trunc"), asc("vec_id"))
  }

  /** Embedding-cosine near-dup pairs over a bounded id range (the exact
    * all-pairs form; the LSH path below is the at-scale variant). Filter is
    * on the ROUNDED score so the oracle's boundary behavior is identical. */
  def cosineNearDupPairs(spark: SparkSession, sfDir: String,
                         threshold: Double = 0.4, maxId: Long = 300L): DataFrame = {
    val e = normed(spark, sfDir).filter(col("vec_id") < maxId)
    val a = e.select(col("vec_id").as("src_id"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("dst_id"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("src_id") < col("dst_id"))
      .select(col("src_id"), col("dst_id"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy("src_id", "dst_id")
  }

  /** Multi-table sign-random-projection LSH: NumTables independent 8-bit
    * keys per vector. One table's recall on weakly-clustered embeddings is
    * poor by nature (per-bit collision ≈ 1 - θ/π; at the rank-10 neighbor's
    * angle here that is ~0.2 per table even with multiprobe) — the textbook
    * scale path is L independent tables, 1-(1-p)^L: measured recall@10 went
    * 0.0-0.2 (single table) → ≥0.8 (8 tables) → min 0.9 / mean ≥0.98
    * (12 tables + radius-2 multiprobe) at sf0.001-0.1. Hyperplanes
    * are deterministic from a seeded generator (stable across JVMs —
    * java.util.Random's algorithm is specified). */
  val NumBits = 8
  val NumTables = 12
  val Dim = 64
  lazy val hyperplanes: Array[Array[Array[Double]]] = {
    val rnd = new java.util.Random(42)
    Array.fill(NumTables, NumBits, Dim)(rnd.nextGaussian())
  }

  /** Table t's bucket key = the NumBits sign bits of v · h_tj. Pure column
    * arithmetic over literal hyperplane arrays — codegen'd, broadcast-free. */
  private def lshKey(v: Column, t: Int): Column =
    (0 until NumBits).foldLeft(lit(0)) { (acc, j) =>
      val h = array(hyperplanes(t)(j).map(lit): _*)
      acc.bitwiseOR(when(dot(v, h) > 0, lit(1 << j)).otherwise(lit(0)))
    }

  /** ETL: the LSH index — every vector replicated once per table with its
    * (t, key) bucket. Physically: partition directories on `t` only (a
    * bounded NumTables = 12), rows SORTED by `key` within each table's files — a probe's
    * key predicates then prune parquet row groups via min/max stats. A
    * (t, key) directory layout was measured first and rejected: 2048
    * partition directories of tiny files put a multi-second listing tax on
    * every probe at test scale, and at 100 TB the sorted-key row-group skip
    * gives the same IO pruning without the small-file explosion.
    * NumTables × corpus rows: the classic LSH space-for-recall trade,
    * built once per scale factor. */
  def lshIndex(spark: SparkSession, sfDir: String): DataFrame =
    graft.etl.Artifacts.ensureParquet(spark, sfDir, "ann_lsh", Seq("t")) {
      normed(spark, sfDir).select(col("vec_id"), col("label"), col("v"), col("nrm"),
        posexplode(array((0 until NumTables).map(t => lshKey(col("v"), t)): _*))
          .as(Seq("t", "key")))
        .repartition(col("t")).sortWithinPartitions("key")
    }

  /** ANN top-k via multi-table LSH with hamming ≤ 2 multiprobe per table:
    * candidates are the vectors sharing a (t, probe-key) bucket with the
    * query in ANY table — an OR of per-table key-set predicates prunes
    * the persisted index (t partition dirs, then sorted-key row-group
    * skipping) to L × (1 + B + C(B,2)) = 12 × 37 buckets, candidates are
    * deduped across tables, then exact cosine within candidates only.
    * Radius-2 multiprobe is the textbook recall lever that costs NO index
    * space (unlike more tables): per-table collision for the rank-10
    * neighbor ≈ P[≤2 of 8 sign bits flip], measured recall@10 went
    * 0.7–0.8 (radius 1) → ≥0.9 (radius 2) across sf and query points
    * while the probed fraction of the corpus stays ~bounded by
    * 37/256 of the key space per table. The index is a build-once ETL artifact
    * (`lshIndex`); the query path is probe-only. Recall is spec-verified
    * against the brute-force baseline; the driver-facing entry wraps this
    * in a recall certificate (`annTopKChecked`). */
  def annTopK(spark: SparkSession, sfDir: String, queryId: Long = 0L, k: Int = 10,
              extraFilter: Column = lit(true)): DataFrame = {
    // Resolve the query VECTOR from the base table (one pushed-down id
    // lookup against a single parquet file), then derive its bucket keys
    // DRIVER-SIDE from the literal hyperplanes — scanning the exploded
    // index to recover the query's keys would read all |tables| × |keys|
    // partition directories twice before the pruned probe even starts
    // (measured: that was ~3 s of a 4.5 s query). Sign bits only, so the
    // driver-side dot needs no particular fold order.
    val Array(qRow) = normed(spark, sfDir).filter(col("vec_id") === queryId)
      .select(col("v"), col("nrm")).collect()
    val qv = qRow.getSeq[Double](0).toArray
    val probe = (0 until NumTables).map { t =>
      val key = (0 until NumBits).foldLeft(0) { (acc, j) =>
        var d = 0.0
        var i = 0
        while (i < qv.length) { d += qv(i) * hyperplanes(t)(j)(i); i += 1 }
        if (d > 0) acc | (1 << j) else acc
      }
      val flips1 = (0 until NumBits).map(j => key ^ (1 << j))
      val flips2 = for (i <- 0 until NumBits; j <- i + 1 until NumBits)
        yield key ^ (1 << i) ^ (1 << j)
      val keys = (key +: flips1) ++ flips2
      col("t") === t && col("key").isin(keys: _*)
    }.reduce(_ || _)
    val e = lshIndex(spark, sfDir)
    val q = spark.range(1)
      .select(typedlit(qv.toSeq).as("qv"), lit(qRow.getDouble(1)).as("qn"))
    e.filter(probe && col("vec_id") =!= queryId && extraFilter)
      .dropDuplicates("vec_id") // a candidate can collide in several tables
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 6).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** Recall floors asserted by the checked ANN entries. Measured recall@10
    * (tools.RecallProbe, 5 query points × 3 scale factors):
    * LSH (12 tables, radius-2 multiprobe) min 0.9 / mean 0.98–1.0 → floor
    * 0.9; IVF min 0.8 / mean 0.92–0.96 (13-of-16 cells probed — on these
    * near-uniform embeddings the cell/probe ratio is inherently
    * unfavorable; clustered real embeddings would probe far fewer) →
    * floor 0.7 keeps a 1-hit margin while still failing on any real index
    * breakage (a wrong bucket key or probe set craters recall — the
    * single-table index measured 0.0-0.2). */
  val LshRecallFloor = 0.9
  val RecallFloor = 0.7

  /** The rq12 tolerance-certificate pattern applied to ANN: the output is
    * the EXACT top-k (DuckDB-expressible, hash-checkable) plus one boolean
    * column asserting the ANN probe's recall against it — the oracle emits
    * `true`, so an index/probe regression flips the boolean and fails the
    * driver compare, while the approximate result itself (which no SQL
    * oracle can reproduce) never enters the hash. Both inputs are ≤ k rows;
    * the exact side is locally checkpointed so its corpus scan runs once
    * for the hit count and the output. */
  private def withRecallCertificate(exact: DataFrame, ann: DataFrame,
                                    k: Int, floor: Double): DataFrame = {
    val e = exact.localCheckpoint()
    val hits = e.select("vec_id").join(ann.select("vec_id"), "vec_id").count()
    e.withColumn("recall_ge_floor", lit(hits >= math.ceil(k * floor).toLong))
  }

  /** Driver-checkable LSH ANN: runs the LSH probe (`annTopK`) and certifies
    * its recall@k against the exact ranking. */
  def annTopKChecked(spark: SparkSession, sfDir: String, queryId: Long = 0L,
                     k: Int = 10, floor: Double = LshRecallFloor): DataFrame =
    withRecallCertificate(
      cosineTopK(spark, sfDir, queryId, k), annTopK(spark, sfDir, queryId, k), k, floor)

  /** Filtered vector search — top-k under a metadata predicate, the
    * feature modern vector stores call "filtered ANN" (a recommender
    * restricted to in-stock items, retrieval restricted to one tenant).
    * The predicate pushes INTO the persisted LSH index scan: `label`
    * rides in the index rows, so filtering happens alongside the (t, key)
    * bucket probe in the same codegen'd scan stage — candidates shrink
    * BEFORE the exact-cosine re-rank, not after (post-filtering a top-k
    * is the classic correctness bug: it returns < k rows whenever the
    * filter is selective). Recall floor re-measured under the filter
    * (selectivity ~1/3): the 12-table radius-2 probe holds ≥0.9 because
    * filtered brute force and filtered probe lose candidates
    * proportionally. Exact filtered top-k is the hash-checked output;
    * the probe enters only through the certificate boolean. */
  def filteredTopKChecked(spark: SparkSession, sfDir: String, queryId: Long = 0L,
                          k: Int = 10, labelMod: Int = 3,
                          floor: Double = LshRecallFloor): DataFrame = {
    val keep = col("label") % labelMod === 0
    val e = normed(spark, sfDir)
    val q = e.filter(col("vec_id") === queryId)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    val exact = e.filter(col("vec_id") =!= queryId && keep)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 6).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
    val ann = annTopK(spark, sfDir, queryId, k, extraFilter = keep)
    withRecallCertificate(exact, ann, k, floor)
  }

  /** Driver-checkable IVF ANN: same certificate over the IVF probe. */
  def ivfTopKChecked(spark: SparkSession, sfDir: String, queryId: Long = 0L,
                     k: Int = 10, floor: Double = RecallFloor): DataFrame =
    withRecallCertificate(
      cosineTopK(spark, sfDir, queryId, k), ivfTopK(spark, sfDir, queryId, k), k, floor)

  /** IVF cells (coarse quantizer size) and probe count. The corpus's
    * embeddings are only weakly clustered (near-uniform on the sphere), so
    * a useful recall needs probing most of the cells — with real clustered
    * embeddings the cell/probe ratio would be far more favorable. Probe
    * sweep (tools-derived, recall@10 over 5 query points per sf):
    * 10 probes min 0.70 (sf0.01), 13 probes min 0.80/0.90/0.90 at
    * sf0.001/0.01/0.1 — 13 is the smallest count whose worst case clears
    * the 0.8 bar everywhere, so that's the contract. */
  val IvfCells = 16
  val IvfProbes = 13

  /** ETL: the IVF index — seeded k-means coarse quantizer fit ONCE per
    * scale factor; persists (a) the centroid table (IvfCells rows) and
    * (b) the assignment table partitioned by cell id (the inverted lists).
    * Returns (centroids, assigned). A per-query quantizer fit would be a
    * full corpus pass per lookup — the definition of a scale-killer. */
  def ivfIndex(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    import graft.etl.Artifacts
    val cPath = Artifacts.path(sfDir, "ann_ivf_centroids")
    val aPath = Artifacts.path(sfDir, "ann_ivf_assigned")
    if (!Artifacts.exists(cPath) || !Artifacts.exists(aPath)) {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val e = normed(spark, sfDir).withColumn("fv", array_to_vector(col("v")))
      val km = new KMeans().setK(IvfCells).setSeed(42)
        .setFeaturesCol("fv").setPredictionCol("cell")
      val model = km.fit(e.select("fv"))
      val centroidRows = model.clusterCenters.zipWithIndex
        .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq
      import spark.implicits._
      centroidRows.toDF("cell", "center").write.mode("overwrite").parquet(cPath)
      model.transform(e).drop("fv").write.mode("overwrite")
        .partitionBy("cell").parquet(aPath)
    }
    (spark.read.parquet(cPath), spark.read.parquet(aPath))
  }

  /** ANN top-k via IVF (inverted-file index): the query probes only the
    * `IvfProbes` cells nearest its vector → exact cosine within those
    * cells. The quantizer + assignment table are build-once ETL artifacts
    * (`ivfIndex`, partitioned by cell → probe = partition pruning); the
    * query path is centroid arithmetic over IvfCells rows plus a pruned
    * scan. Seeded k-means → deterministic; approximate by design →
    * recall is spec-verified against brute force, no SQL oracle. */
  def ivfTopK(spark: SparkSession, sfDir: String, queryId: Long = 0L, k: Int = 10,
              nProbes: Int = IvfProbes): DataFrame = {
    val (centroids, assigned) = ivfIndex(spark, sfDir)
    // Probe set: the IvfProbes cells nearest the query vector (driver-side
    // arithmetic over IvfCells centroid rows — constant work at any scale).
    val Array(qRow) = assigned.filter(col("vec_id") === queryId)
      .select(col("v"), col("nrm")).collect()
    val qv = qRow.getSeq[Double](0).toArray
    val qn = qRow.getDouble(1)
    val probes = centroids.select(col("cell"), col("center")).collect()
      .map { r =>
        val ca = r.getSeq[Double](1).toArray
        var dot = 0.0; var nc = 0.0
        var j = 0
        while (j < ca.length) { dot += ca(j) * qv(j); nc += ca(j) * ca(j); j += 1 }
        (r.getInt(0), dot / (math.sqrt(nc) * qn))
      }
      .sortBy(-_._2).take(nProbes).map(_._1)
    val q = assigned.filter(col("vec_id") === queryId)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    assigned.filter(col("cell").isin(probes.map(Int.box): _*) && col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 6).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** Per-label centroid similarity: mean vector per label (element-wise via
    * posexplode + re-assemble), then cosine of each label centroid against
    * the global centroid — a grouped-vector-aggregation pattern every
    * embedding pipeline needs (also the building block of IVF training). */
  def labelCentroidSimilarity(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), posexplode(vec(col("embedding"))).as(Seq("pos", "x")))
    val byLabel = e.groupBy("label", "pos").agg(avg("x").as("cx"))
      .groupBy("label").agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pairs"))
      .select(col("label"), transform(col("pairs"), p => p.getField("cx")).as("cv"))
    val global = e.groupBy("pos").agg(avg("x").as("gx"))
      .agg(array_sort(collect_list(struct(col("pos"), col("gx")))).as("pairs"))
      .select(transform(col("pairs"), p => p.getField("gx")).as("gv"))
    byLabel.crossJoin(broadcast(global))
      .select(col("label"),
        round(dot(col("cv"), col("gv")) / (norm(col("cv")) * norm(col("gv"))), 6).as("cosine_to_global"))
      .orderBy("label")
  }

  /** Vector-quantization assignment + confusion matrix — nearest-centroid
    * classification, the evaluation half of every clustering/labeling
    * pipeline: per-label mean centroids over the WHOLE corpus (partial-
    * combinable avg), then each probe vector assigned to its nearest
    * centroid and cross-tabulated against its true label. The distance
    * arithmetic is INTEGER-exact: centroids and components quantize to
    * ×10⁴ fixed-point BIGINTs first, so squared distances carry no float-
    * summation-order drift (the sim_quantize_int8 trick applied to
    * assignment) and the argmin — tie-broken by label — is deterministic
    * on any engine. Plan: 10 centroid rows broadcast, one linear pass
    * over the probes; at 100 TB assignment is a map-side-only stage. */
  def vqAssign(spark: SparkSession, sfDir: String, maxVec: Long = 500L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), vec(col("embedding")).as("v"))
    val cent = e.select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(avg("x").as("cx"))
      .select(col("label").as("clabel"), col("pos"),
        round(col("cx") * 10000).cast("long").as("qc"))
      .groupBy("clabel")
      .agg(array_sort(collect_list(struct(col("pos"), col("qc")))).as("pairs"))
      .select(col("clabel"), transform(col("pairs"), p => p.getField("qc")).as("qcv"))
    val probes = e.filter(col("vec_id") < maxVec)
      .select(col("vec_id"), col("label"),
        transform(col("v"), x => round(x * 10000).cast("long")).as("qv"))
    val dist = probes.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("label"), col("clabel"),
        aggregate(zip_with(col("qv"), col("qcv"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("dist"))
    val w = Window.partitionBy("vec_id").orderBy(col("dist").asc, col("clabel").asc)
    dist.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(col("label").cast("long").as("true_label"),
        col("clabel").cast("long").as("assigned_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy("true_label", "assigned_label")
  }

  /** Int8-quantized cosine top-k — the memory-scaling leg of similarity
    * search: per-vector symmetric quantization (scale = 127/max|v|, the
    * classic absmax scheme) shrinks a 100 TB float corpus ~4× and turns
    * the inner loop into exact INTEGER arithmetic, which is what makes the
    * result bit-reproducible across engines — the quantized dot and both
    * quantized norms are integer-exact, so `q_cosine` carries none of the
    * float-summation-order drift the exact path has to round away. The
    * exact cosine rides along per row so the output doubles as a
    * quantization-error report (top-k by q_cosine, exact score visible).
    * Quantization itself is deterministic: double ops are IEEE-identical
    * on both engines and round() ties go away-from-zero on both. */
  /** ETL: the int8-encoded corpus — per-vector symmetric scale
    * (sc = 127/max|x|), codes stored as array<tinyint> (the actual 4×
    * memory win vs float32; ~8× vs the double-array in-memory form), and
    * the quantized norm precomputed. Build-once per scale factor
    * (`Artifacts`): the float corpus is scanned at BUILD time only; at
    * 100 TB this is the scheduled encode job, and the query path scans
    * nothing but the codes table. */
  def int8Index(spark: SparkSession, sfDir: String): DataFrame =
    graft.etl.Artifacts.ensureParquet(spark, sfDir, "int8_codes") {
      normed(spark, sfDir)
        .withColumn("sc", lit(127.0) / greatest(
          aggregate(transform(col("v"), x => abs(x)), lit(0.0), (a, x) => greatest(a, x)),
          lit(1e-12))) // zero-vector guard, same literal as the oracle
        .withColumn("qv",
          transform(col("v"), x => round(x * col("sc"), 0).cast("long").cast("byte")))
        .withColumn("nq", sqrt(
          aggregate(transform(col("qv"), x => x.cast("long") * x),
            lit(0L), (a, x) => a + x).cast("double")))
        .select(col("vec_id"), col("label"), col("qv"), col("nq"))
    }

  /** Int8 cosine top-k as a PROBE of the build-once codes artifact: the
    * ranking sweep touches only (vec_id, label, qv, nq) — never the float
    * corpus — with the integer dot a codegen'd expression
    * (graft.functions.DotProductInt8). Only the k winners (plus the query
    * row) are joined back to the base vectors for the exact-cosine column,
    * a broadcast of ≤k+1 rows. Integer quantized arithmetic keeps q_cosine
    * bit-reproducible across engines (no float-summation-order drift);
    * ties order by vec_id. */
  def quantizedTopK(spark: SparkSession, sfDir: String,
                    queryId: Long = 0L, k: Int = 10): DataFrame = {
    val codes = int8Index(spark, sfDir)
    val q = codes.filter(col("vec_id") === queryId)
      .select(col("qv").as("q_qv"), col("nq").as("q_nq"))
    val shortlist = codes.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(graft.functions.DotProductInt8(col("qv"), col("q_qv")).cast("double")
          / (col("nq") * col("q_nq")), 6).as("q_cosine"))
      .orderBy(desc("q_cosine"), asc("vec_id"))
      .limit(k)
    val qBase = normed(spark, sfDir).filter(col("vec_id") === queryId)
      .select(col("v").as("q_v"), col("nrm").as("q_nrm"))
    val base = normed(spark, sfDir).select(col("vec_id").as("b_id"), col("v"), col("nrm"))
    // Exact-cosine attach: base JOIN broadcast(shortlist) — the k-row side
    // is the broadcast, the float corpus streams through the build-free
    // probe side and only k rows survive (pqTopK's re-rank shape).
    base.join(broadcast(shortlist), col("b_id") === col("vec_id"))
      .crossJoin(broadcast(qBase))
      .select(col("vec_id"), col("label"), col("q_cosine"),
        round(dot(col("v"), col("q_v")) / (col("nrm") * col("q_nrm")), 6).as("cosine"))
      .orderBy(desc("q_cosine"), asc("vec_id"))
  }

  // —— Product quantization (PQ) — the memory-compression ANN path ——

  /** 8 subspaces × 8 dims, 16 centroids each: 8 four-bit codes per vector.
    * The encoded corpus is vec_id + label + 8 small ints ≈ 16 B/row vs
    * 64 floats ≈ 256 B — a ~16× smaller scan, which at 100 TB is the
    * difference between an affordable full ADC sweep and none. Candidates
    * re-ranked exactly (64-deep shortlist). */
  val PqM = 8
  val PqSubDim = Dim / PqM
  val PqK = 16
  /** ADC shortlist depth. 4-bit-per-subspace codes on near-uniform
    * embeddings rank coarsely (measured recall@10: 64-deep min 0.5 at
    * sf0.001, 256-deep min 0.6 at sf0.1) — the standard remedy that costs
    * NO index space is a deeper shortlist; the exact re-rank still touches
    * a constant 1024 rows (≈ the efSearch/nprobe dial of deployed ANN). */
  val PqCandidates = 1024

  /** Unit-normalized vectors: PQ trains and encodes on v/‖v‖ so the ADC
    * table approximates COSINE directly (dot of unit vectors). */
  private def unitNormed(spark: SparkSession, sfDir: String): DataFrame =
    normed(spark, sfDir).select(col("vec_id"), col("label"),
      transform(col("v"), x => x / col("nrm")).as("u"))

  /** ETL: PQ codebooks (per-subspace seeded k-means over the dim slice —
    * 8 independent 8-dim fits, each a corpus pass over 1/8 of the floats)
    * and the encoded corpus. Encoding is pure column arithmetic: the 16
    * trained centroids per subspace become LITERAL arrays, argmin is
    * array_position(dists, array_min(dists)) — whole-stage codegen, no
    * UDF, no join. Build-once per scale factor (`Artifacts`); the query
    * path only reads. At 100 TB the same two artifacts land on object
    * storage, and encoding a new ingest batch reuses the frozen codebooks
    * (train-once, encode-forever — the standard PQ deployment). */
  def pqIndex(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    import graft.etl.Artifacts
    val cbPath = Artifacts.path(sfDir, "ann_pq_codebooks")
    val cdPath = Artifacts.path(sfDir, "ann_pq_codes")
    if (!Artifacts.exists(cbPath) || !Artifacts.exists(cdPath)) {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val u = unitNormed(spark, sfDir).cache()
      val codebooks: Seq[(Int, Int, Seq[Double])] = (0 until PqM).flatMap { m =>
        val sub = u.select(array_to_vector(
          slice(col("u"), m * PqSubDim + 1, PqSubDim)).as("fv"))
        val model = new KMeans().setK(PqK).setSeed(42 + m)
          .setFeaturesCol("fv").setPredictionCol("c").fit(sub)
        model.clusterCenters.zipWithIndex.map { case (c, i) => (m, i, c.toArray.toSeq) }
      }
      import spark.implicits._
      codebooks.toDF("m", "code", "center").repartition(1)
        .write.mode("overwrite").parquet(cbPath)
      val byM = codebooks.groupBy(_._1).map { case (m, cs) =>
        m -> cs.sortBy(_._2).map(_._3.toArray)
      }
      def d2(sub: Column, c: Array[Double]): Column =
        aggregate(zip_with(sub, array(c.map(lit): _*), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x)
      val codeCols = (0 until PqM).map { m =>
        val sub = slice(col("u"), m * PqSubDim + 1, PqSubDim)
        val dists = array(byM(m).map(c => d2(sub, c)): _*)
        // argmin; ties resolve to the FIRST minimal index — deterministic.
        (array_position(dists, array_min(dists)) - 1).cast("int")
      }
      u.select(col("vec_id"), col("label"), array(codeCols: _*).as("codes"))
        .write.mode("overwrite").parquet(cdPath)
      u.unpersist()
    }
    (spark.read.parquet(cbPath), spark.read.parquet(cdPath))
  }

  /** Driver-side ADC lookup tables for a unit query vector: adc(m)(c) =
    * dot(q_m, centroid_mc) — PqM × PqK eight-dim dots, constant work at
    * any corpus size. */
  private def adcTables(cb: DataFrame, qu: Array[Double]): Array[Array[Double]] = {
    val adc = Array.ofDim[Double](PqM, PqK)
    cb.collect().foreach { r =>
      val m = r.getInt(0); val c = r.getInt(1)
      val cent = r.getSeq[Double](2)
      var d = 0.0
      var i = 0
      while (i < PqSubDim) { d += qu(m * PqSubDim + i) * cent(i); i += 1 }
      adc(m)(c) = d
    }
    adc
  }

  /** Corpus-side approximate score over a `codes` column: 8 literal-array
    * lookups + 7 adds per row, entirely inside whole-stage codegen. */
  private def adcScore(adc: Array[Array[Double]]): Column =
    (0 until PqM).map { m =>
      element_at(typedlit(adc(m).toSeq), element_at(col("codes"), m + 1) + 1)
    }.reduce(_ + _)

  /** ANN top-k via PQ + ADC (asymmetric distance computation): the query
    * stays un-quantized; each subspace's 16 centroid dot-products become
    * driver-side literal lookup tables (`adcTables`), so the corpus-side
    * score is pure codegen arithmetic over the 16×-compressed codes table.
    * The ADC shortlist then re-ranks EXACTLY against the base vectors.
    * Recall is spec-verified; the driver entry wraps the certificate. */
  def pqTopK(spark: SparkSession, sfDir: String, queryId: Long = 0L, k: Int = 10): DataFrame = {
    val (cb, codes) = pqIndex(spark, sfDir)
    val Array(qRow) = normed(spark, sfDir).filter(col("vec_id") === queryId)
      .select(col("v"), col("nrm")).collect()
    val qv = qRow.getSeq[Double](0).toArray
    val qn = qRow.getDouble(1)
    val approx = adcScore(adcTables(cb, qv.map(_ / qn)))
    // Shortlist stays distributed: TakeOrderedAndProject over the ADC
    // scores, then a BROADCAST semi-join onto the base table for the exact
    // re-rank — no driver round-trip, and unlike the selective-expansion
    // ops (where a literal isin prunes row groups) a 1024-wide uniform id
    // set defeats min/max pruning anyway, so the join loses nothing.
    val short = codes.filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), approx.as("approx"))
      .orderBy(desc("approx"), asc("vec_id")).limit(PqCandidates)
      .select("vec_id")
    rerankExact(spark, sfDir, short, qv, qn, k)
  }

  /** Exact cosine re-rank of a distributed shortlist (≤ PqCandidates ids):
    * broadcast semi-join onto the base vectors, exact dot, top-k. */
  private def rerankExact(spark: SparkSession, sfDir: String, shortlist: DataFrame,
                          qv: Array[Double], qn: Double, k: Int): DataFrame = {
    val q = spark.range(1)
      .select(typedlit(qv.toSeq).as("qv"), lit(qn).as("qn"))
    normed(spark, sfDir).join(broadcast(shortlist), "vec_id")
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 6).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** Measured recall@10 (tools.RecallProbe, 5 query points × 3 sf):
    * min 1.00 / mean 1.00 at the 1024-deep shortlist — floor 0.9 keeps one
    * hit of margin while real index breakage (wrong codebook, broken ADC
    * table) still craters it (64-deep measured down to 0.5). */
  val PqRecallFloor = 0.9

  /** Driver-checkable PQ ANN: exact top-k + recall certificate. */
  def pqTopKChecked(spark: SparkSession, sfDir: String, queryId: Long = 0L,
                    k: Int = 10, floor: Double = PqRecallFloor): DataFrame =
    withRecallCertificate(
      cosineTopK(spark, sfDir, queryId, k), pqTopK(spark, sfDir, queryId, k), k, floor)

  // —— IVF-PQ — the composed 100 TB ANN layout ——

  /** ETL: PQ codes carrying their IVF cell, physically partitioned by
    * cell — one join of the two existing artifacts at build time. This is
    * the layout every billion-vector deployment converges on: the coarse
    * quantizer prunes the LISTING (only probed cell directories are even
    * enumerated), and within a cell the scan reads 16×-compressed codes,
    * so a probe touches probes/cells of the corpus × 1/16 of the bytes. */
  def ivfPqIndex(spark: SparkSession, sfDir: String): DataFrame =
    graft.etl.Artifacts.ensureParquet(spark, sfDir, "ann_ivfpq_codes", Seq("cell")) {
      val (_, codes) = pqIndex(spark, sfDir)
      val (_, assigned) = ivfIndex(spark, sfDir)
      codes.join(assigned.select("vec_id", "cell"), "vec_id")
    }

  /** ANN top-k via IVF-PQ: probe-cell selection is driver-side centroid
    * arithmetic (as `ivfTopK`), the ADC sweep runs only over the probed
    * cells' partition directories, and the shortlist re-ranks exactly.
    * Recall is capped by the IVF stage (the true neighbor must live in a
    * probed cell) — the PQ stage at 1024-deep adds no further loss
    * (measured: ivfpq tracks ivf to within one hit). */
  def ivfPqTopK(spark: SparkSession, sfDir: String, queryId: Long = 0L, k: Int = 10): DataFrame = {
    val (centroids, assigned) = ivfIndex(spark, sfDir)
    val (cb, _) = pqIndex(spark, sfDir)
    val Array(qRow) = assigned.filter(col("vec_id") === queryId)
      .select(col("v"), col("nrm")).collect()
    val qv = qRow.getSeq[Double](0).toArray
    val qn = qRow.getDouble(1)
    val probes = centroids.select(col("cell"), col("center")).collect()
      .map { r =>
        val ca = r.getSeq[Double](1).toArray
        var d = 0.0; var nc = 0.0
        var j = 0
        while (j < ca.length) { d += ca(j) * qv(j); nc += ca(j) * ca(j); j += 1 }
        (r.getInt(0), d / (math.sqrt(nc) * qn))
      }
      .sortBy(-_._2).take(IvfProbes).map(_._1)
    val approx = adcScore(adcTables(cb, qv.map(_ / qn)))
    val short = ivfPqIndex(spark, sfDir)
      .filter(col("cell").isin(probes.map(Int.box): _*) && col("vec_id") =!= queryId)
      .select(col("vec_id"), approx.as("approx"))
      .orderBy(desc("approx"), asc("vec_id")).limit(PqCandidates)
      .select("vec_id")
    rerankExact(spark, sfDir, short, qv, qn, k)
  }

  /** Driver-checkable IVF-PQ ANN: exact top-k + recall certificate at the
    * IVF floor (the coarse stage is the binding recall constraint). */
  def ivfPqTopKChecked(spark: SparkSession, sfDir: String, queryId: Long = 0L,
                       k: Int = 10, floor: Double = RecallFloor): DataFrame =
    withRecallCertificate(
      cosineTopK(spark, sfDir, queryId, k), ivfPqTopK(spark, sfDir, queryId, k), k, floor)

  /** Radius (range) search: every vector within a cosine threshold of the
    * query — retrieval's "all sufficiently similar", vs top-k's "best k".
    * Same broadcast-query single-scan shape as `cosineTopK`, but the
    * result size is data-dependent, so the filter is on the ROUNDED score
    * (the `cosineNearDupPairs` rule): both engines compare the identical
    * 6-decimal value, so membership at the boundary cannot diverge. No
    * limit — the radius itself bounds the output (and at 100 TB the IVF
    * cell index prunes the scan to cells whose centroid-distance bound
    * can reach the radius; this is the exact baseline). */
  def radiusSearch(spark: SparkSession, sfDir: String,
                   queryId: Long = 0L, minCosine: Double = 0.25): DataFrame = {
    val e = normed(spark, sfDir)
    val q = e.filter(col("vec_id") === queryId)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    e.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 6).as("cosine"))
      .filter(col("cosine") >= minCosine)
      .orderBy(desc("cosine"), asc("vec_id"))
  }

  /** Pairwise-cosine histogram over a bounded sample — the embedding-space
    * health check (anisotropy / collapse shows up as mass piling far from
    * 0) run before trusting any ANN index. Buckets are clamped
    * floor((cos+1)·5) over [−1, 1]; min/max per bucket ride along as the
    * exact envelope. The all-pairs join is the SAMPLE's cost by design —
    * at 100 TB the sample stays fixed-size while the corpus grows; scoring
    * runs on the rounded cosine so bucket membership is engine-identical. */
  def cosineHistogram(spark: SparkSession, sfDir: String, maxId: Long = 300L): DataFrame = {
    val e = normed(spark, sfDir).filter(col("vec_id") < maxId)
    val a = e.select(col("vec_id").as("ai"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("bi"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("ai") < col("bi"))
      .select(round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("cos"))
      .groupBy(least(greatest(floor((col("cos") + 1.0) * 5), lit(0)), lit(9))
        .cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min("cos"), 6).as("lo"), round(max("cos"), 6).as("hi"))
      .orderBy("bucket")
  }

  /** Batched top-k: one scan answers MANY queries at once — the shape a
    * retrieval service actually runs (per-query scans would re-read the
    * corpus per request). The query block broadcasts (bounded: nQ rows ×
    * dim), the corpus streams through one cross-score projection, and
    * rank-within-query is a window partitioned on qid. At production
    * query volume the window's per-qid partitions are the ANN index's
    * job (each query probes its cells independently); this exact form is
    * the recall baseline and the right plan for nQ small enough that
    * nQ × corpus fits a scan budget. */
  def batchTopK(spark: SparkSession, sfDir: String,
                nQueries: Long = 5L, k: Int = 3): DataFrame = {
    val e = normed(spark, sfDir)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("cosine"), asc("vec_id"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("label"),
        round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 6).as("cosine"))
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"), col("label"), col("cosine"))
      .orderBy("qid", "rnk")
  }

  /** Hard-negative mining for contrastive training (sim_hard_negatives) —
    * the triplet-prep pass of embedding-model training: for each anchor,
    * the hardest POSITIVE (highest-cosine same-label neighbor) and the
    * top-k hardest NEGATIVES (highest-cosine different-label vectors),
    * plus the triplet-margin violation flag (negative within `marginMicro`
    * of the hardest positive — the pairs a triplet loss actually learns
    * from). Everything integer-micros (floor of cosine·10⁶): max/argmax
    * are order-independent, so the per-anchor elections are
    * partial-agg-safe at any partitioning. Plan shape: the bounded anchor
    * set broadcasts against ONE corpus scan (batchTopK's shape); the
    * hardest positive is a plain hash-aggregate argmax; the negative
    * ranking is a window over the |anchors|-bounded qid domain. At 100 TB
    * the anchor batch stays the broadcast side and the corpus is read
    * once. */
  def hardNegatives(spark: SparkSession, sfDir: String,
                    nAnchors: Long = 8L, k: Int = 3,
                    marginMicro: Long = 100000L): DataFrame = {
    val e = normed(spark, sfDir)
    val q = e.filter(col("vec_id") < nAnchors)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("v").as("qv"), col("nrm").as("qn"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qlabel"), col("vec_id"), col("label"),
        floor(dot(col("v"), col("qv")) / (col("nrm") * col("qn")) *
          lit(1000000.0)).cast("long").as("cos_micro"))
    val hardestPos = scored.filter(col("label") === col("qlabel"))
      .groupBy("qid").agg(max("cos_micro").as("pos_micro"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("cos_micro"), asc("vec_id"))
    scored.filter(col("label") =!= col("qlabel"))
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
      .join(broadcast(hardestPos), "qid")
      .select(col("qid"), col("rnk"), col("vec_id").as("neg_id"),
        col("label").as("neg_label"), col("cos_micro").as("neg_micro"),
        col("pos_micro"),
        (col("cos_micro") > col("pos_micro") - marginMicro).as("margin_violation"))
      .orderBy("qid", "rnk")
  }
}
