package graft

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** CONCURRENT-SERVICE shape: one engine instance (one SparkSession) serving
  * several queries AT ONCE — the long-lived-service mode every shared
  * cluster runs in, where the danger points are the `TrainingData.cached()`
  * shared-asset map (concurrent first touch of the same asset) and any
  * session-level conf a query flips mid-flight. Eight queries that
  * deliberately overlap on shared cached assets (token tables, vocab,
  * shingles) run in parallel threads against a COLD cache; every result
  * must equal its sequential baseline. */
class ConcurrencySpec extends SparkSpec {

  private val names = Seq(
    "q_dedup_minhash", "q_dedup_simhash", "q_text_stats", "q_dedup_exact",
    "q_lang_id", "q_quality_score", "q_dedup_embed", "q_agg_pricing")

  test("eight overlapping queries agree with sequential results under concurrency") {
    val d = sfDir("sf0.001")
    // sequential baseline first (warm or cold is irrelevant to VALUES —
    // determinism across cache states is pinned elsewhere)
    val expected = names.map(n =>
      n -> SparkEntry.queries(n)(spark, d).collect().toSeq).toMap
    // cold shared cache, then all eight at once
    graft.operators.TrainingData.unpersistAll()
    implicit val ec: ExecutionContext = ExecutionContext.global
    val futs = names.map(n => Future {
      n -> SparkEntry.queries(n)(spark, d).collect().toSeq
    })
    val got = Await.result(Future.sequence(futs), 10.minutes).toMap
    names.foreach { n =>
      assert(got(n) == expected(n), s"$n diverged under concurrent execution")
    }
  }
}
