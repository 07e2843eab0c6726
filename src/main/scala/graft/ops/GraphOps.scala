package graft.ops

import graft.core.Graph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's query surface (`app.py`), re-expressed as declarative
  * Spark plans over the graph projection (SURVEY §2 / §3). Each function is
  * one named operator from the §2 inventory; `graft.SparkEntry` binds them
  * to fixed parameters for the driver's oracle harness.
  */
object GraphOps {

  /** J1+P1+P2+A2+T1 — the flagship "Winder" common-neighbors top-k
    * (app.py:206-245): given a friend set, score candidates by shared
    * FRIEND_OF neighbors, exclude the friends themselves, top-k.
    *
    * Physical shape at scale: the friend set is a literal → broadcast to the
    * edge scan; aggregation is partial+final hash agg keyed by candidate;
    * the top-k is `TakeOrderedAndProject` (no global sort).
    */
  def winderTopK(spark: SparkSession, sfDir: String, friendKeys: Seq[Int], k: Int = 3): DataFrame = {
    val friends = Graph.nodes(spark, sfDir)
      .filter(col("nid").isin(friendKeys: _*))        // P6 exact lookups
      .select(col("name").as("f_name"))
    val fu = Graph.undirectedOne(Graph.friendOf(spark, sfDir))
    broadcast(friends)
      .join(fu, col("f_name") === col("src"))          // J1 expand 1-hop typed
      .select(col("f_name"), col("dst").as("candidate"))
      .join(broadcast(friends.select(col("f_name").as("ex"))),
            col("candidate") === col("ex"), "left_anti") // P2 anti-filter
      .groupBy("candidate")
      .agg(count(lit(1)).as("common_friends"),         // A2 score
           array_join(array_sort(collect_list("f_name")), ",").as("shared_with")) // A4
      .orderBy(desc("common_friends"), asc("candidate")) // T1 top-k
      .limit(k)
  }

  /** S1+P8+T2 — full node scan, project the person card, sort by name
    * (app.py:189-203). Column pruning reaches the parquet scan. */
  def scanPersons(spark: SparkSession, sfDir: String): DataFrame =
    Graph.nodes(spark, sfDir)
      .select("name", "house", "nation", "acctbal")
      .orderBy("name")

  /** P3+T3 — case-insensitive substring search + limit (app.py:436-446).
    * Deterministic via total order (Cypher's bare LIMIT is not; SURVEY §2.5). */
  def searchCi(spark: SparkSession, sfDir: String, q: String, limit: Int = 10): DataFrame =
    Graph.nodes(spark, sfDir)
      .filter(lower(col("name")).contains(lit(q.toLowerCase)))
      .select("name", "house")
      .orderBy("name")
      .limit(limit)
}
