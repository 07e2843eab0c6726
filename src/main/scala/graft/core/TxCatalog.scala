package graft.core

import java.nio.file.{Files, Path, Paths}
import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** Multi-table atomic commits — the catalog layer a lakehouse needs above
  * single-table logs (the Nessie / Iceberg-REST-catalog pattern; Delta and
  * our TxTable alone are single-table-atomic only). The catalog keeps its
  * own tiny versioned log of REFS: each catalog version is a full
  * `table<TAB>version` map. Writers first commit to the individual tables
  * (each table's own optimistic log as usual — those versions exist but
  * are not yet "the" state), then publish ONE catalog version that moves
  * every participating ref together, via the same create-exclusive
  * atomic-link protocol TxTable uses. A reader that resolves table
  * versions THROUGH a catalog version therefore sees a cross-table-
  * consistent world: both sides of a transfer or neither, never a torn
  * read — regardless of how the underlying table logs interleaved.
  *
  * Cost model at 100 TB: a catalog version is a few bytes per table —
  * commit cost is independent of data size, and pinning an old catalog
  * version gives repeatable cross-table reads for free (time travel
  * composes: catalog version → table versions → immutable manifests).
  *
  * Conflict rule: `commit` retries on catalog-publish races, but if a
  * retry finds one of ITS OWN tables' refs moved (someone else committed
  * those tables), it throws — the transaction was built against stale
  * table state and must be redone, the standard first-committer-wins
  * outcome. Races on DISJOINT table sets merge cleanly.
  */
final class TxCatalog private (spark: SparkSession, dir: String) {

  private val logDir = Paths.get(dir, "_catalog")

  private def listNames(p: Path): Seq[String] = {
    val s = Files.list(p)
    try s.iterator().asScala.map(_.getFileName.toString).toList
    finally s.close()
  }

  /** Highest published catalog version, or -1 for an empty log. */
  def version: Long =
    if (!Files.isDirectory(logDir)) -1L
    else listNames(logDir)
      .collect { case s if s.startsWith("c") && s.endsWith(".txt") =>
        s.stripPrefix("c").stripSuffix(".txt").toLong }
      .foldLeft(-1L)(math.max)

  /** table → pinned table version, as of catalog version `v`. */
  def refs(v: Long): Map[String, Long] =
    Files.readAllLines(logDir.resolve(f"c$v%08d.txt"), StandardCharsets.UTF_8)
      .asScala.filter(_.nonEmpty)
      .map { l => val Array(n, tv) = l.split('\t'); n -> tv.toLong }.toMap

  def refsHead: Map[String, Long] = refs(version)

  private def publish(v: Long, r: Map[String, Long]): Boolean = {
    Files.createDirectories(logDir)
    val tmp = logDir.resolve(s".tmp-${UUID.randomUUID()}")
    Files.write(tmp, r.toSeq.sortBy(_._1).map { case (n, tv) => s"$n\t$tv" }
      .mkString("\n").getBytes(StandardCharsets.UTF_8))
    // Same single-atomicity-point contract as the table log: one
    // conditional put, swappable for object stores (TxTable.commitPrimitive).
    TxTable.commitPrimitive.putIfAbsent(logDir.resolve(f"c$v%08d.txt"), tmp)
  }

  /** Atomically move `updates`' refs in one new catalog version. All
    * other tables' refs carry forward from the head at publish time.
    * `expect` is the transaction's READ SET — the refs it staged its
    * table commits against (defaults to the head at call time): if any
    * of those refs moved by publish time, the transaction was built on
    * stale state and is refused (first-committer-wins). Races touching
    * DISJOINT tables merge cleanly through the retry loop. */
  def commit(updates: Map[String, Long],
             expect: Map[String, Long] = null): Long = {
    val expected =
      if (expect != null) expect
      else refsHead.view.filterKeys(updates.contains).toMap
    var committed = -1L
    while (committed < 0) {
      val v = version
      val cur = refs(v)
      updates.keys.foreach { n =>
        require(cur.get(n) == expected.get(n),
          s"catalog conflict on '$n': ref moved ${expected.get(n)} -> ${cur.get(n)}")
      }
      if (publish(v + 1, cur ++ updates)) committed = v + 1
    }
    committed
  }
}

object TxCatalog {

  /** Create a catalog at `dir` with the given initial refs (version 0). */
  def create(spark: SparkSession, dir: String,
             initial: Map[String, Long]): TxCatalog = {
    val c = new TxCatalog(spark, dir)
    require(c.version < 0, s"catalog already exists at $dir")
    require(c.publish(0L, initial), s"concurrent catalog create at $dir")
    c
  }

  /** Attach to an existing catalog. */
  def open(spark: SparkSession, dir: String): TxCatalog = {
    val c = new TxCatalog(spark, dir)
    require(c.version >= 0, s"no catalog at $dir")
    c
  }
}
