package graft.core

import graft.TestSpark
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

class CacheScopeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("scoped frees frames persisted inside; outside a scope the caller owns them") {
    val inScope = CacheScope.scoped {
      val df = CacheScope.persisted(Seq(1, 2, 3).toDF("x"))
      df.count()
      assert(df.storageLevel == StorageLevel.MEMORY_AND_DISK)
      df
    }
    assert(inScope.storageLevel == StorageLevel.NONE)

    val bare = CacheScope.persisted(Seq(4, 5).toDF("x"))
    bare.count()
    assert(bare.storageLevel == StorageLevel.MEMORY_AND_DISK)
    bare.unpersist(blocking = false)
  }

  test("scopes nest: inner releases only its own registrations") {
    val outer = CacheScope.scoped {
      val o = CacheScope.persisted(Seq(1).toDF("x"))
      o.count()
      val inner = CacheScope.scoped {
        val i = CacheScope.persisted(Seq(2).toDF("x"))
        i.count()
        i
      }
      assert(inner.storageLevel == StorageLevel.NONE)
      assert(o.storageLevel == StorageLevel.MEMORY_AND_DISK)
      o
    }
    assert(outer.storageLevel == StorageLevel.NONE)
  }

  test("an operator's diamond intermediates die with the scope") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    CacheScope.scoped {
      graft.llmdata.DocDedup.minhashLshPairs(docs).count()
    }
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"scope leaked persisted RDDs: $leaked")
  }
}
