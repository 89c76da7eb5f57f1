package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpecBase

/** The two-phase distributed prefix scan must equal the sequential scan on
  * arbitrary inputs and partition counts — including partitions ≫ rows
  * (empty partitions), one partition, values of zero, and repeated runs
  * (the range sample must not leak nondeterminism into the result).
  */
class PrefixSumSpec extends SparkSpecBase {
  import spark.implicits._

  private def forAllSeeded[A](gen: Gen[A], n: Int = 10)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  test("exclusive prefix sum equals the sequential scan on random inputs") {
    val gen = for {
      vals <- Gen.listOfN(60, Gen.chooseNum(0L, 50L))
      parts <- Gen.oneOf(1, 3, 4, 16, 97)
    } yield (vals, parts)

    forAllSeeded(gen) { case (vals, parts) =>
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("k", "v")
        .repartition(5) // scramble the incoming layout
      val got = PrefixSum.exclusive(df, "k", "v", "off", parts)
        .select("k", "v", "off").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val expected = vals.zipWithIndex
        .scanLeft((0L, 0L, 0L)) { case ((_, pv, po), (v, i)) =>
          (i.toLong, v, po + pv)
        }.tail.map { case (k, v, off) => (k, v, off) }
      assert(got.toSeq == expected)
    }
  }

  test("offsets are deterministic across invocations") {
    val df = (0 until 500).map(i => (i.toLong, (i % 7).toLong)).toDF("k", "v")
    val a = PrefixSum.exclusive(df, "k", "v", "off", 8)
      .select("k", "off").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = PrefixSum.exclusive(df, "k", "v", "off", 8)
      .select("k", "off").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("string order keys and extra payload columns pass through") {
    val df = Seq(("c", 5L, "x"), ("a", 2L, "y"), ("b", 3L, "z"))
      .toDF("k", "v", "payload")
    val got = PrefixSum.exclusive(df, "k", "v", "off", 2)
      .select("k", "payload", "off").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq(("a", "y", 0L), ("b", "z", 2L), ("c", "x", 5L)))
  }

  test("empty input yields an empty result") {
    val df = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(PrefixSum.exclusive(df, "k", "v", "off", 4).count() == 0)
  }
}
