package graft

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

/** Result stability under CONCURRENT identical queries on one session —
  * the correctness half of the service-shape claim (tools.ConcurrencyProbe
  * measures the latency half; BASELINE.md records it). The reference is an
  * interactive web app: a query service multiplexes many requests over one
  * SparkSession, so a scan, join, or top-k whose result depended on
  * scheduling order would be a correctness bug only visible under load. */
class ConcurrencySpec extends AnyFunSuite {
  import TestSpark._

  test("concurrent identical interactive queries return identical results") {
    val names = Seq("j1_winder_topk", "j2_expand_1hop", "p3_search_ci")
    def run(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, sf)
        .collect().map(_.mkString("|")).sorted.toSeq
    val refs = names.map(n => n -> run(n)).toMap // serial reference (warm)

    val pool = java.util.concurrent.Executors.newFixedThreadPool(12)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futs = (0 until 12).map { i =>
        val q = names(i % names.length)
        Future { q -> run(q) }
      }
      val res = Await.result(Future.sequence(futs), 5.minutes)
      res.foreach { case (q, r) =>
        assert(r == refs(q), s"concurrent $q diverged from its serial result")
      }
    } finally pool.shutdown()
  }
}
