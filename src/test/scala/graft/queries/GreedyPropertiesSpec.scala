package graft.queries

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpecBase
import graft.functions.VectorFunctions.vecNorm

/** Randomized agreement checks for the unrolled greedy operators (MMR,
  * k-center): the relational round unrolls must match a sequential
  * reference greedy on TIE-HEAVY random inputs — vectors drawn from a
  * 4-value component palette in dim 4, so exact duplicate vectors and
  * equal quantized cosines occur constantly (the failure mode the real
  * corpus may never exercise: a tie broken differently by the two
  * engines' sort orders). Seeded gens, same style as
  * OperatorPropertiesSpec.
  */
class GreedyPropertiesSpec extends SparkSpecBase {
  import spark.implicits._

  private def forAllSeeded[A](gen: Gen[A], n: Int = 8)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val vecGen: Gen[Array[Float]] = Gen.listOfN(4,
      Gen.oneOf(-1f, 0f, 1f, 2f))
    .map { l =>
      val a = l.toArray
      if (a.forall(_ == 0f)) a(3) = 1f // keep norms positive
      a
    }

  private val corpusGen: Gen[Seq[(Long, Array[Float])]] = for {
    n <- Gen.chooseNum(15, 36)
    vs <- Gen.listOfN(n, vecGen)
  } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }

  private def dot(a: Array[Float], b: Array[Float]): Double =
    a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
  private def sim(a: Array[Float], b: Array[Float]): Double =
    q6(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))

  test("MMR unroll equals sequential greedy on tie-heavy random vectors") {
    forAllSeeded(corpusGen) { rows =>
      val df = rows.toDF("vec_id", "e").withColumn("nrm", vecNorm(col("e")))
      val got = Similarity.mmrCore(df).collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk")) ->
          (r.getAs[Long]("vec_id"), r.getAs[Double]("score_r"))).toMap
      val vs = rows.toMap
      rows.map(_._1).filter(_ < 10).foreach { q =>
        val cand = rows.map(_._1).filter(_ != q)
          .map(id => id -> sim(vs(q), vs(id)))
          .sortBy { case (id, s) => (-s, id) }.take(20)
        var selected = Vector.empty[Long]
        (1 to 5).foreach { rnk =>
          val (pick, score) = cand
            .filterNot { case (id, _) => selected.contains(id) }
            .map { case (id, s) =>
              val pen = if (selected.isEmpty) 0.0
                        else selected.map(sid => sim(vs(id), vs(sid))).max
              (id, q6(0.7 * s - 0.3 * pen))
            }
            .sortBy { case (id, sc) => (-sc, id) }.head
          selected :+= pick
          assert(got((q, rnk.toLong)) == ((pick, score)),
            s"q=$q rnk=$rnk: got ${got((q, rnk.toLong))}, ref ($pick, $score)")
        }
      }
    }
  }

  test("label spread equals reference votes on tie-heavy random vectors") {
    val gen = for {
      rows <- corpusGen
      labels <- Gen.listOfN(rows.size, Gen.chooseNum(0L, 3L))
    } yield rows.zip(labels).map { case ((id, v), l) => (id, v, l) }
    forAllSeeded(gen) { rows =>
      val df = rows.toDF("vec_id", "e", "label")
        .withColumn("nrm", vecNorm(col("e")))
      val got = Similarity.labelSpreadCore(df).collect()
        .map(r => r.getAs[Long]("vec_id") ->
          (r.getAs[Long]("pred_label"), r.getAs[Long]("n_votes"),
           r.getAs[Long]("true_label"), r.getAs[Long]("correct"))).toMap
      val vs = rows.map(r => r._1 -> r._2).toMap
      val lbl = rows.map(r => r._1 -> r._3).toMap
      val labeled = rows.map(_._1).filter(_ % 4 == 0)
      val unlabeled = rows.map(_._1).filterNot(_ % 4 == 0)
      assert(got.size == unlabeled.size)
      unlabeled.foreach { id =>
        val top5 = labeled.map { lid => (lid, lbl(lid), sim(vs(lid), vs(id))) }
          .sortBy { case (lid, _, s) => (-s, lid) }.take(5)
        val (pred, votes) = top5.groupBy(_._2)
          .map { case (l, v) => (l, v.size.toLong, v.map(_._3).max) }
          .toSeq.sortBy { case (l, n, best) => (-n, -best, l) }
          .headOption.map { case (l, n, _) => (l, n) }.get
        assert(got(id) == ((pred, votes, lbl(id), if (pred == lbl(id)) 1L else 0L)),
          s"vec $id: got ${got(id)}, ref ($pred, $votes, ${lbl(id)})")
      }
    }
  }

  test("k-center unroll equals sequential greedy on tie-heavy random vectors") {
    forAllSeeded(corpusGen) { rows =>
      val df = rows.toDF("vec_id", "e").withColumn("nrm", vecNorm(col("e")))
      val got = Similarity.kcenterCore(df).collect().sortBy(_.getAs[Long]("rnk"))
      val vs = rows.toMap
      def dist(a: Long, b: Long) = 1.0 - sim(vs(a), vs(b))
      var centers = Vector(0L)
      var dists = Vector(0.0)
      var mind = rows.map(_._1).map(id => id -> dist(id, 0L)).toMap
      (2 to 8).foreach { _ =>
        val (pick, d) = mind.toSeq.sortBy { case (id, d0) => (-d0, id) }.head
        centers :+= pick
        dists :+= d
        mind = mind.map { case (id, d0) => id -> math.min(d0, dist(id, pick)) }
      }
      assert(got.map(_.getAs[Long]("vec_id")).toSeq == centers,
        s"selection differs: ${got.map(_.getAs[Long]("vec_id")).toSeq} vs $centers")
      assert(got.map(_.getAs[Double]("dist_r")).toSeq == dists)
      assert(got.map(_.getAs[Long]("n_assigned")).sum == rows.length)
      // assignment ties break to the earlier-selected center
      val byCenter = rows.map(_._1).groupBy { id =>
        centers.zipWithIndex
          .map { case (c, i) => (dist(id, c), i + 1) }.minBy(identity)._2
      }
      got.foreach { r =>
        assert(r.getAs[Long]("n_assigned") ==
          byCenter.getOrElse(r.getAs[Long]("rnk").toInt, Seq.empty).size.toLong)
      }
    }
  }
}
