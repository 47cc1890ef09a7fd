package graft.operators

import graft.SparkSpec

/** The multimodal plumbing: binary schema, batched mapPartitions decode,
  * and equivalence between the typed (Dataset) path and the declarative
  * (Catalyst expression) twin.
  */
class MultimodalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("media table has a real binary column with typed metadata") {
    val m = Multimodal.mediaTable(spark, sf)
    val schema = m.schema
    assert(schema("bytes").dataType.typeName === "binary")
    assert(schema("kind").dataType.typeName === "string")
    val kinds = m.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds === Set("image", "audio", "video"))
  }

  test("mapPartitions decode path == declarative expression twin") {
    val typed = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, sf))
      .orderBy("media_id").collect()
    val sql = Multimodal.mediaFeaturesSql(spark, sf).collect()
    assert(typed.length === sql.length)
    typed.zip(sql).foreach { case (a, b) =>
      assert(a.getAs[Long]("media_id") === b.getAs[Long]("media_id"))
      assert(a.getAs[Long]("n_bytes") === b.getAs[Long]("n_bytes"))
      assert(a.getAs[Int]("width") === b.getAs[Int]("width"))
      assert(a.getAs[Int]("height") === b.getAs[Int]("height"))
      assert(a.getAs[Int]("n_frames") === b.getAs[Int]("n_frames"))
    }
  }

  test("mapPartitions resize path == declarative twin; fits target, never upscales") {
    val typed = Multimodal.resizeMedia(Multimodal.mediaTable(spark, sf))
      .orderBy("media_id").collect()
    val sql = Multimodal.resizeSpecSql(spark, sf).collect()
    assert(typed.length === sql.length && typed.nonEmpty)
    typed.zip(sql).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq)
      val (w, h) = (a.getAs[Int]("width"), a.getAs[Int]("height"))
      val (nw, nh) = (a.getAs[Int]("new_width"), a.getAs[Int]("new_height"))
      assert(nw >= 1 && nh >= 1 && nw <= 32 && nh <= 32)
      assert(nw <= w && nh <= h, "never upscale")
      assert(a.getAs[Long]("new_n_bytes") <= a.getAs[Long]("n_bytes"))
    }
  }

  test("batch packing: byte budget respected, batches are contiguous id ranges") {
    val rows = Multimodal.m4BatchPack(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("kind")).foreach { case (kind, g) =>
      val sorted = g.sortBy(_.getAs[Long]("batch_id"))
      // batch ids are dense from 0 within each modality
      assert(sorted.map(_.getAs[Long]("batch_id")).toSeq ===
        (0L until sorted.length).toSeq, s"kind=$kind")
      // cum-based packing overshoots the budget by at most ONE item's
      // carry-in (the item whose end crosses the window boundary), so
      // every batch is bounded by budget + the largest single payload
      val maxItem = Multimodal.mediaTable(spark, sf)
        .select(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col("bytes")))).head.getInt(0).toLong
      sorted.foreach { b =>
        val bytes = b.getAs[Long]("batch_bytes")
        assert(b.getAs[Long]("n_items") >= 1L)
        assert(bytes < 4096L + maxItem,
          s"kind=$kind batch=$b exceeds budget + one payload")
      }
      // contiguous, non-overlapping id ranges in batch order
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_id") < b.getAs[Long]("first_id"))
        case _ =>
      }
    }
  }
}
