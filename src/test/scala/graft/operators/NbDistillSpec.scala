package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** q161/q162 Naive-Bayes distillation semantics beyond the SQL oracle:
  * the integer-LLR student must actually LEARN the teacher signal
  * (train-set agreement well above chance), and the q162 reliability
  * curve must be monotone where it claims confidence — the two
  * quantitative bounds a production quality filter ships with. The
  * oracle proves cross-engine equality; these prove the numbers mean
  * something.
  */
class NbDistillSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("q161: train-set agreement beats the majority-class baseline") {
    val r = graft.SparkEntry.queries("q161_nb_distill")(spark, sf)
      .selectExpr("sum(n_pos)", "sum(n_neg)", "sum(n_agree)").collect()(0)
    val (np, nn, agree) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(np > 100 && nn > 100,
           s"teacher bands too thin to be meaningful: pos=$np neg=$nn")
    val acc = agree.toDouble / (np + nn)
    val majority = math.max(np, nn).toDouble / (np + nn)
    assert(acc >= 0.70, s"NB train-set agreement $acc below 0.70")
    assert(acc > majority + 0.05,
           s"NB agreement $acc no better than predicting the majority class $majority")
  }

  test("q162: labeled positive share is non-decreasing across score bins") {
    // The reliability curve: among TEACHER-LABELED docs, the observed
    // positive share must grow with the claimed LLR bin. Bins with too
    // few labeled docs are noise, not signal — compare only adjacent
    // bins that each carry >= 30 labeled docs.
    val rows = graft.SparkEntry.queries("q162_nb_calibration")(spark, sf)
      .selectExpr("bin", "n_pos", "n_neg", "share_pos")
      .collect().sortBy(_.getLong(0))
    val solid = rows.filter(r => r.getLong(1) + r.getLong(2) >= 30)
    assert(solid.length >= 3, s"calibration curve has ${solid.length} solid bins")
    solid.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getDouble(3) <= hi.getDouble(3) + 1e-9,
             s"share_pos not monotone: bin ${lo.getLong(0)}=${lo.getDouble(3)} " +
               s"> bin ${hi.getLong(0)}=${hi.getDouble(3)}")
    }
    // the extreme solid bins must actually separate the classes
    assert(solid.last.getDouble(3) - solid.head.getDouble(3) >= 0.5,
           "top and bottom score bins barely differ in observed positive share")
  }

  test("q169: the shipped theta is the sweep's agreement argmax; the curve trades as claimed") {
    val sweep = graft.SparkEntry.queries("q169_nb_threshold_sweep")(spark, sf)
      .collect()
    assert(sweep.length === 21, "one row per candidate theta")
    // the q161 objective must be maximized exactly at the shipped theta
    // (ties break low — the tuneTheta spelling)
    val best = sweep.maxBy(r => (r.getAs[Long]("agreement"),
                                 -r.getAs[Long]("theta")))
    val shipped = graft.SparkEntry.queries("q161_nb_distill")(spark, sf)
      .select("theta").head().getLong(0)
    assert(best.getAs[Long]("theta") === shipped,
           s"q161 shipped theta $shipped but the sweep's argmax is " +
             s"${best.getAs[Long]("theta")}")
    // monotone mechanics of a threshold sweep: raising theta can only
    // shrink the kept set, recall never increases, tp+fn is constant
    val byTheta = sweep.sortBy(_.getAs[Long]("theta"))
    byTheta.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi.getAs[Long]("n_kept") <= lo.getAs[Long]("n_kept"))
      assert(hi.getAs[Long]("tp") <= lo.getAs[Long]("tp"))
    }
    assert(byTheta.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fn"))
             .distinct.length === 1, "labeled-positive total must be constant")
    // boundary row: theta=-10 (bins live in [-10, 9]) keeps every doc,
    // so recall is exactly 1 and the kept count is the corpus
    assert(byTheta.head.getAs[Double]("recall") === 1.0)
    assert(byTheta.head.getAs[Long]("n_kept") ===
             graft.Tables.documents(spark, sf).count())
  }
}
