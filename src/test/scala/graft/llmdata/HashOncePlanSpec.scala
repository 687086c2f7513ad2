package graft.llmdata

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.columnar.InMemoryRelation
import org.scalatest.funsuite.AnyFunSuite

/** r15 optimization pin: the text pair generators ([[DocDedup.minhashLshPairs]],
  * [[DocDedup.ngramJaccardPairs]], [[DocDedup.substrPairs]]) hash the corpus
  * ONCE, inside their persisted cache build. Their candidate self-joins
  * consume the cache on both sides, and a broadcast build side defeats
  * Catalyst's subplan reuse — so any hash/signature/window-fold expression
  * left OUTSIDE the cache runs over the whole corpus once per consumer
  * (the pre-r15 shape: two full poly-hash passes per plan, and for substr a
  * duplicated tokenize→hash→fold leg). This spec walks the cache-substituted
  * optimized plan and asserts zero [[graft.functions.ArrayPolyHash]] /
  * [[graft.functions.MinHashSigs]] nodes survive outside an
  * InMemoryRelation, so a refactor that quietly moves hashing back
  * downstream of the cache fails here instead of as a silent 2× in the
  * bench. */
class HashOncePlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  /** (#ArrayPolyHash, #MinHashSigs) in the optimized plan OUTSIDE cached
    * relations (InMemoryRelation is a leaf of the logical plan; its cache-
    * build plan — where the one legitimate hash pass lives — is not a
    * child, so the traversal never descends into it). */
  private def outerHashCounts(df: DataFrame): (Int, Int, Boolean) = {
    val plan = df.queryExecution.optimizedPlan
    var poly = 0
    var sigs = 0
    var cached = false
    plan.foreach {
      case _: InMemoryRelation => cached = true
      case node =>
        node.expressions.foreach(_.foreach {
          case _: graft.functions.ArrayPolyHash => poly += 1
          case _: graft.functions.MinHashSigs => sigs += 1
          case _ => ()
        })
    }
    (poly, sigs, cached)
  }

  test("minhashLshPairs hashes and signs the corpus only in the cache build") {
    graft.core.CacheScope.scoped {
      val df = DocDedup.minhashLshPairs(docs)
      assert(df.count() > 0, "fixture must produce pairs (non-vacuous)")
      val (poly, sigs, cached) = outerHashCounts(df)
      assert(cached, "the shingle/signature cache must be in the plan")
      assert(poly == 0, s"poly_hash_array outside the cache: $poly (expected 0)")
      assert(sigs == 0, s"minhash_sigs outside the cache: $sigs (expected 0)")
    }
  }

  test("ngramJaccardPairs hashes the corpus only in the cache build") {
    graft.core.CacheScope.scoped {
      val df = DocDedup.ngramJaccardPairs(docs)
      assert(df.count() > 0, "fixture must produce pairs (non-vacuous)")
      val (poly, _, cached) = outerHashCounts(df)
      assert(cached, "the hashed-shingle cache must be in the plan")
      assert(poly == 0, s"poly_hash_array outside the cache: $poly (expected 0)")
    }
  }

  test("substrPairs folds window hashes only in the cache build") {
    graft.core.CacheScope.scoped {
      val df = DocDedup.substrPairs(docs)
      assert(df.count() > 0, "fixture must produce pairs (non-vacuous)")
      val (poly, _, cached) = outerHashCounts(df)
      assert(cached, "the window-hash cache must be in the plan")
      assert(poly == 0, s"poly_hash_array outside the cache: $poly (expected 0)")
    }
  }
}
