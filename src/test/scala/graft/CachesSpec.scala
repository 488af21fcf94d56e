package graft

import org.apache.spark.storage.StorageLevel
import graft.core.Caches

/** Cache-lifecycle witnesses for the scoped-release discipline the
  * streaming ingests use: a micro-batch must release ONLY its own
  * caches, never a concurrent serving query's. */
class CachesSpec extends SparkSpec {
  import spark.implicits._

  test("scoped releases only caches cacheOnce created inside the scope") {
    spark.catalog.clearCache()
    // the "serving query's" cache, owned outside the scope
    val served = Caches.cacheOnce(Seq(1, 2, 3).toDF("a").filter($"a" > 0))
    served.count()
    served.storageLevel should not be StorageLevel.NONE
    var inner: org.apache.spark.sql.DataFrame = null
    Caches.scoped {
      inner = Caches.cacheOnce(Seq(4, 5).toDF("b").filter($"b" > 4))
      inner.count()
      inner.storageLevel should not be StorageLevel.NONE
      // a plan already cached outside is returned as-is, NOT adopted by
      // the scope — releasing it on exit would evict the serving state
      Caches.cacheOnce(served).storageLevel should not be StorageLevel.NONE
    }
    inner.storageLevel shouldBe StorageLevel.NONE // batch cache released
    served.storageLevel should not be StorageLevel.NONE // serving survives
    Caches.release(served)
  }

  test("scoped nests: inner scope release restores outer tracking") {
    spark.catalog.clearCache()
    var outerDf: org.apache.spark.sql.DataFrame = null
    var innerDf: org.apache.spark.sql.DataFrame = null
    Caches.scoped {
      outerDf = Caches.cacheOnce(Seq(1).toDF("x").filter($"x" > 0))
      Caches.scoped {
        innerDf = Caches.cacheOnce(Seq(2, 3).toDF("y").filter($"y" > 1))
      }
      innerDf.storageLevel shouldBe StorageLevel.NONE
      outerDf.storageLevel should not be StorageLevel.NONE
    }
    outerDf.storageLevel shouldBe StorageLevel.NONE
  }
}
