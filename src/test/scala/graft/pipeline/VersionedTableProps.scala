package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec

/** Model-based randomized gate for the r13 manifest machinery: random
  * commit sequences (full write / incremental append / rollback /
  * truncate / expire) run against BOTH the real [[VersionedTable]] and
  * a trivial in-memory model (version -> multiset of rows), and every
  * retained snapshot must read back exactly the model's content after
  * every step. This is the adversarial complement to the example-based
  * specs: `dirs=` list resolution, redirect handling, expiry
  * reference-counting, and declared-schema empty reads have to hold
  * under ARBITRARY interleavings, not just the hand-picked ones.
  * Seeds are fixed so a failure replays deterministically. */
class VersionedTableProps extends SparkSpec {
  import spark.implicits._

  private def readBack(table: String, v: Option[Long]): Seq[Long] =
    VersionedTable.read(spark, table, v)
      .collect().map(_.getLong(0)).sorted.toSeq

  test("random write/append/rollback/truncate/expire sequences match " +
      "the in-memory model on every retained snapshot") {
    Seq(1L, 7L, 42L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val table =
        Files.createTempDirectory(s"graft_vtp_$seed").toString + "/t"
      // declared schema: truncate/empty-append stay readable
      VersionedTable.create(table,
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, v STRING"))
      // model: retained version -> sorted row keys
      var model = Map.empty[Long, Seq[Long]]
      var nextKey = 0L
      def freshRows(n: Int): Seq[Long] = {
        val r = (0 until n).map(i => nextKey + i)
        nextKey += n
        r
      }
      def df(rows: Seq[Long]) =
        rows.map(k => (k, s"r$k")).toDF("k", "v")

      (1 to 30).foreach { step =>
        val current: Seq[Long] =
          model.maxByOption(_._1).map(_._2).getOrElse(Seq.empty)
        rnd.nextInt(5) match {
          case 0 => // full write
            val rows = freshRows(1 + rnd.nextInt(3))
            val v = VersionedTable.write(df(rows), table)
            model += (v -> rows.sorted)
          case 1 => // incremental append (content = prev + new)
            val rows = freshRows(1 + rnd.nextInt(3))
            val v = VersionedTable.append(df(rows), table)
            model += (v -> (current ++ rows).sorted)
          case 2 if model.nonEmpty => // rollback to a random retained v
            val target =
              model.keys.toSeq.sorted.apply(rnd.nextInt(model.size))
            val v = VersionedTable.rollback(table, target)
            model += (v -> model(target))
          case 3 if model.nonEmpty => // truncate (empty snapshot)
            val v = VersionedTable.truncate(spark, table)
            model += (v -> Seq.empty)
          case 4 if model.size > 2 => // expire, always keep >= 1
            val keep = 1 + rnd.nextInt(model.size)
            VersionedTable.expire(table, keepLast = keep)
            model = model.toSeq.sortBy(_._1).takeRight(keep).toMap
          case _ => () // op not applicable yet
        }
        // the REAL table must agree with the model everywhere
        assert(VersionedTable.versions(table) == model.keys.toSeq.sorted,
          s"seed=$seed step=$step retained versions diverged")
        model.foreach { case (v, rows) =>
          assert(readBack(table, Some(v)) == rows,
            s"seed=$seed step=$step version $v content diverged")
        }
        if (model.nonEmpty)
          assert(readBack(table, None) == model.maxBy(_._1)._2,
            s"seed=$seed step=$step current content diverged")
      }
    }
  }
}
