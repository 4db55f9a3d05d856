package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.lake.{LakeTable, MatView}
import graft.model.{ChangeEvent, Schemas}
import graft.stream.CdcIngest

/** Generative MatView invariant: for ANY op soup (inserts / updates /
  * deletes, group-migrating, with lsns SHUFFLED across batches so later
  * batches carry earlier versions), ANY batch partition, and ANY
  * interleaving of bounded maintains, the view equals the from-scratch
  * recompute of the base's merged state. Raw ScalaCheck, fixed seed
  * (cache/offline conventions of LwwPropertySpec).
  */
class MatViewPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(6)
      .withInitialSeed(org.scalacheck.rng.Seed(1234L))
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val trialGen: Gen[(List[ChangeEvent], List[Int], Int)] = for {
    n <- Gen.choose(5, 60)
    keys <- Gen.choose(1, 6)
    lsnPerm <- Gen.const(scala.util.Random.javaRandomToRandom(
      new java.util.Random(n * 31L + keys)).shuffle((0 until n).toList))
    evs <- Gen.sequence[List[ChangeEvent], ChangeEvent]((0 until n).map { i =>
      for {
        k <- Gen.choose(0, keys - 1)
        isDel <- Gen.frequency(4 -> false, 1 -> true)
        grp <- Gen.choose(0, 2)
        tok <- Gen.choose(0, 999)
      } yield ChangeEvent(
        if (isDel) "D" else "U", s"k$k", lsnPerm(i).toLong,
        new Timestamp(i * 1000L),
        if (isDel) null else Array(tok),
        if (isDel) null else java.lang.Integer.valueOf(1), s"g$grp")
    })
    nBatches <- Gen.choose(1, 5)
    // maintain after each batch with probability ~1/2, always at the end
    maintainStep <- Gen.choose(1, 3)
  } yield (evs, List(nBatches), maintainStep)

  test("view == recompute under random soups, batchings and bounded maintains") {
    var trial = 0
    check("matview-recompute", Prop.forAll(trialGen) {
      case (evs, List(nBatches), maintainStep) =>
        trial += 1
        val dir = tmpDir(s"mvp$trial")
        val base = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
        val v = MatView.create(spark, s"$dir/v", base, Seq("source"),
          Seq("s_tok" -> "element_at(tokens, 1)"), numBuckets = 2)
        // every other trial ALSO runs the affected-group-recompute mode
        val vm =
          if (trial % 2 == 0) Some(MatView.create(spark, s"$dir/vm", base,
            Seq("source"),
            recomputed = Seq("mn" -> "min(element_at(tokens, 1))",
              "mx" -> "max(element_at(tokens, 1))"), numBuckets = 2))
          else None
        val per = math.max(1, (evs.size + nBatches - 1) / nBatches)
        evs.grouped(per).zipWithIndex.foreach { case (chunk, e) =>
          CdcIngest.applyBatch(base, chunk.toDS().toDF(), epochId = e.toLong)
          if (e % 2 == 0) { v.catchUp(maintainStep); vm.foreach(_.catchUp(maintainStep)) }
        }
        v.catchUp(maintainStep)
        vm.foreach(_.catchUp(maintainStep))
        val got = v.read().select(col("source"), col("cnt"), col("s_tok"))
          .as[(String, Long, Long)].collect().toSet
        val want = base.read().groupBy(col("source"))
          .agg(count(lit(1)).as("cnt"),
            sum(coalesce(element_at(col("tokens"), 1).cast("long"), lit(0L))).as("s"))
          .as[(String, Long, Long)].collect().toSet
        val minmaxOk = vm.forall { m =>
          val g = m.read().select(col("source"), col("cnt"), col("mn"), col("mx"))
            .as[(String, Long, Option[Int], Option[Int])].collect().toSet
          val w = base.read().groupBy(col("source"))
            .agg(count(lit(1)).as("cnt"),
              min(element_at(col("tokens"), 1)).as("mn"),
              max(element_at(col("tokens"), 1)).as("mx"))
            .as[(String, Long, Option[Int], Option[Int])].collect().toSet
          g == w
        }
        got == want && minmaxOk
    })
  }

  test("join view == fresh join under random two-table soups") {
    var trial = 0
    val gen = for {
      t <- trialGen
      rightEvs <- Gen.listOfN(20, for {
        k <- Gen.choose(0, 5)
        isDel <- Gen.frequency(5 -> false, 1 -> true)
        q <- Gen.choose(0, 99)
        lsn <- Gen.choose(0, 200)
      } yield (if (isDel) "D" else "U", s"k$k", lsn.toLong,
        if (isDel) null else java.lang.Integer.valueOf(q)))
    } yield (t._1, t._2, rightEvs)
    check("joinview-freshjoin", Prop.forAll(gen) {
      case (evs, List(nBatches), rightEvs) =>
        trial += 1
        val dir = tmpDir(s"jvp$trial")
        val base = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
        val right = LakeTable.create(spark, s"$dir/r",
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id",
              org.apache.spark.sql.types.StringType, nullable = false),
            org.apache.spark.sql.types.StructField("quality",
              org.apache.spark.sql.types.IntegerType, nullable = true))),
          numBuckets = 2)
        val v = graft.lake.JoinView.create(spark, s"$dir/v", base, right)
        val per = math.max(1, (evs.size + nBatches - 1) / nBatches)
        val rper = math.max(1, (rightEvs.size + nBatches - 1) / nBatches)
        val rChunks = rightEvs.grouped(rper).toSeq
        evs.grouped(per).zipWithIndex.foreach { case (chunk, e) =>
          CdcIngest.applyBatch(base, chunk.toDS().toDF(), epochId = e.toLong)
          if (e < rChunks.size)
            CdcIngest.applyBatch(right,
              rChunks(e).toDF("op", "doc_id", "lsn", "quality"), epochId = e.toLong)
          if (e % 2 == 0) v.catchUpAll()
        }
        v.catchUpAll()
        val got = v.read().select(col("doc_id"), col("n_tok"), col("quality"))
          .collect().map(_.toString).sorted.toSeq
        val want = base.read().join(right.read(), Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tok"), col("quality"))
          .collect().map(_.toString).sorted.toSeq
        got == want
    })
  }
}
