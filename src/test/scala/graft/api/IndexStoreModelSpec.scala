package graft.api

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Model-based check of the delta-sidecar store: a seeded-random sequence of
  * mutations — conflict-ignore upserts ("add" deltas, old-wins), deletes
  * ("del" tombstones), streaming-style put batches ("put" deltas, new-wins
  * replace-touched-keys), and folds — must leave `read()` equal to a plain
  * in-memory map at every checkpoint, regardless of how many sidecars are
  * pending or how they interleave. This is the strongest guard on the
  * merge-on-read kind semantics: any mis-ordered shadow/tombstone resolution
  * diverges from the map within a few steps.
  */
class IndexStoreModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Shared object keys (k0..k14, several chunks per key) so the put-kind
    * shadow rule — a batch REPLACES every document of its touched keys —
    * is distinguishable from the add-kind union rule.
    */
  private def key(id: Long): Long = id % 15
  private def docsDf(m: Seq[(Long, String)]) =
    m.toDF("doc_id", "content")
      .withColumn("object_keys", array(concat(lit("k"), col("doc_id") % 15)))

  test("random mutation sequences match the in-memory model at every checkpoint") {
    val rnd = new scala.util.Random(1234)
    val tmp = java.nio.file.Files.createTempDirectory("graft-model").toString
    val store = new ParquetIndexStore(spark, s"$tmp/idx", foldEvery = 4)
    var model = Map.empty[Long, String]

    val init = (0L until 30L).map(i => i -> s"v0-$i")
    store.replace(docsDf(init))
    model = init.toMap

    for (step <- 1 to 24) {
      rnd.nextInt(4) match {
        case 0 => // conflict-ignore upsert: existing ids keep the OLD copy
          val batch = (1 to 5).map(_ => rnd.between(0L, 60L)).distinct
            .map(id => id -> s"v$step-$id")
          store.upsert(docsDf(batch))
          batch.foreach { case (id, c) => if (!model.contains(id)) model += id -> c }
        case 1 => // tombstone delete (ids may or may not exist)
          val ids = (1 to 3).map(_ => rnd.between(0L, 60L)).distinct
          store.delete(ids)
          model --= ids
        case 2 => // streaming put batch: NEW-WINS, and it REPLACES every
          // document sharing a touched object key (the re-chunked object)
          val batch = (1 to 4).map(_ => rnd.between(0L, 60L)).distinct
            .map(id => id -> s"p$step-$id")
          store.appendDelta(docsDf(batch))
          val touched = batch.map { case (id, _) => key(id) }.toSet
          model = model.filterNot { case (id, _) => touched(key(id)) } ++ batch
        case 3 =>
          store.foldDeltas()
      }
      if (step % 6 == 0 || step == 24) {
        val got = store.read().select("doc_id", "content")
          .as[(Long, String)].collect().toMap
        assert(got == model,
          s"divergence at step $step (pending deltas: ${store.deltaCount}): " +
            s"missing=${(model.keySet -- got.keySet).toSeq.sorted.take(5)} " +
            s"extra=${(got.keySet -- model.keySet).toSeq.sorted.take(5)} " +
            s"diff=${model.keySet.intersect(got.keySet).filter(k => model(k) != got(k)).toSeq.sorted.take(5)}")
      }
    }
  }
}
