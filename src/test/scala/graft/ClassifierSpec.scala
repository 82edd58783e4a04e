package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Classifier

/** Contracts for the distributed logistic-regression fit: it must
  * actually LEARN (perfect separation of planted non-axis-aligned
  * data), the loss must fall, and folding the internal feature
  * standardization back into raw-space weights must not change
  * predictions.
  */
class ClassifierSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  /** 200 points on a diagonal boundary y = [x1 + x2 > 0] with margin:
    * no single feature separates them, the fit must combine both.
    */
  private def planted = {
    val rows = (0 until 200).map { i =>
      val r = new scala.util.Random(i) // per-row seed: deterministic data
      val x1 = r.nextDouble() * 4 - 2
      val x2 = r.nextDouble() * 4 - 2
      val s = x1 + x2
      // carve a margin band so the classes are cleanly separable
      val shifted = if (s >= 0) s + 0.5 else s - 0.5
      val x2m = shifted - x1
      (i.toLong, Seq(x1, x2m), if (shifted >= 0) 1 else 0)
    }
    rows.toDF("id", "f", "y")
  }

  test("planted diagonal boundary is fully recovered") {
    val df = planted.cache()
    val model = Classifier.trainLogistic(df, "f", "y", iters = 80, lr = 1.0)
    val acc = df.select(
        ((Classifier.predictProb(col("f"), model) > 0.5).cast("int") === col("y"))
          .cast("int").as("ok"))
      .agg(avg("ok")).head().getDouble(0)
    df.unpersist()
    assert(acc == 1.0, s"accuracy $acc on separable data")
    // both features must carry weight — the boundary is diagonal
    assert(model.weights.forall(math.abs(_) > 0.1),
      s"degenerate weights ${model.weights.toSeq}")
  }

  test("loss decreases and ends well below chance") {
    val df = planted.cache()
    val model = Classifier.trainLogistic(df, "f", "y", iters = 80, lr = 1.0)
    df.unpersist()
    val l = model.losses
    assert(l.head > l.last, s"loss did not fall: ${l.head} -> ${l.last}")
    assert(l.last < 0.3, s"final loss ${l.last} (chance is ln 2 = 0.693)")
    // monotone within float-agg jitter
    l.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-6, s"loss rose $a -> $b")
    }
  }

  test("corpus quality entry recovers its weak-supervision rule") {
    val got = SparkEntry.queries("p09_quality_classifier")(spark, sfDir)
      .agg(avg(col("correct").cast("double"))).head().getDouble(0)
    assert(got >= 0.9, s"weak-label recovery accuracy $got")
  }
}
