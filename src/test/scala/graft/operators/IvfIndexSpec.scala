package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.scalatest.funsuite.AnyFunSuite

/** The IVF index must amortize: one KMeans fit per (corpus, k) per
  * session, every later query batch reuses the cached centroids +
  * persisted assignment.
  */
class IvfIndexSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("second q54 invocation reuses the fitted index (no refit)") {
    val first = SparkEntry.queries("q54_ann_ivf")(spark, sf).count()
    val fitsAfterFirst = TrainingData.ivfFits.get()
    val second = SparkEntry.queries("q54_ann_ivf")(spark, sf).count()
    assert(TrainingData.ivfFits.get() === fitsAfterFirst,
           "second invocation refit the KMeans index")
    assert(first === second)
  }
}
