package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Property-style equivalence over seeded random corpora: for ANY
  * small corpus — skewed vocabularies, single-word docs, one-source
  * and many-source shapes, repeated-word degenerate docs — the
  * distributed drift report equals the in-memory TV reference, and
  * the reweighting report equals the in-memory DoReMi reference. The
  * brute-force specs (DriftSpec, DoremiWeightsSpec) prove the harness
  * corpus once; this proves the formulations over 15 corpus shapes
  * each, including the edges the harness data never hits. */
class DriftPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Scale = 1000000L

  private def tvReference(docs: Seq[(String, String)]): Map[String, (Long, Long)] = {
    val tokens = docs.flatMap { case (s, t) => t.split(" ").map(s -> _) }
    val n = tokens.length.toLong
    val pt = tokens.groupBy(_._2).view.mapValues(_.length.toLong * Scale / n).toMap
    val pTotal = pt.values.sum
    tokens.groupBy(_._1).map { case (s, toks) =>
      val ns = toks.length.toLong
      val stc = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val d = stc.map { case (t, c) => math.abs(c * Scale / ns - pt(t)) }.sum
      val ptPresent = stc.keysIterator.map(pt).sum
      s -> (stc.size.toLong, (d + (pTotal - ptPresent)) / 2)
    }
  }

  test("driftCore == in-memory TV reference on 15 random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    (1 to 15).foreach { trial =>
      val nSrc = 1 + rnd.nextInt(4)
      val docs = (0 until (1 + rnd.nextInt(12))).map { i =>
        val src = s"s${rnd.nextInt(nSrc)}"
        val words = rnd.nextInt(3) match {
          case 0 => Seq(vocab(rnd.nextInt(vocab.length)))          // single word
          case 1 => Seq.fill(1 + rnd.nextInt(6))(vocab(rnd.nextInt(2))) // skewed repeats
          case _ => Seq.fill(1 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.length)))
        }
        (src, words.mkString(" "))
      }
      val got = Curation.driftCore(docs.toDF("source", "text")).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == tvReference(docs),
        s"trial $trial diverged:\n got $got\n exp ${tvReference(docs)}\n docs $docs")
    }
  }

  private def doremiReference(
      fl: Seq[(String, Long)], smooth: Long): Map[String, (Long, Long, Long, Long)] = {
    val baseline = fl.map(_._2).sum / fl.size
    val per = fl.groupBy(_._1).map { case (s, ds) =>
      val f = ds.map(_._2).sum / ds.size
      s -> (ds.size.toLong, f, math.max(0L, baseline - f))
    }
    val total = per.values.map(_._3 + smooth).sum
    per.map { case (s, (n, f, e)) => s -> (n, f, e, (e + smooth) * 1000L / total) }
  }

  test("doremiFromFluency == in-memory reference on 15 random loss profiles") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (1 to 15).foreach { trial =>
      val nSrc = 1 + rnd.nextInt(5)
      val fl = (0 until (nSrc + rnd.nextInt(20))).map { _ =>
        (s"s${rnd.nextInt(nSrc)}", rnd.nextInt(1000001).toLong)
      }
      val got = TrainingMix.doremiFromFluency(fl.toDF("source", "fluency")).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(got == doremiReference(fl, 10000L),
        s"trial $trial diverged:\n got $got\n exp ${doremiReference(fl, 10000L)}\n fl $fl")
    }
  }
}
