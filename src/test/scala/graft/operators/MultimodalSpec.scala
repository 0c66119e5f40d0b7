package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {

  test("payloads carry binary + typed metadata struct") {
    val df = Multimodal.payloads(spark, sfDir)
    assert(df.schema("payload").dataType.typeName == "binary")
    val meta = df.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("modality", "mime", "width", "height", "n_bytes"))
    val mods = df.select(col("meta.modality")).distinct().collect().map(_.getString(0)).toSet
    assert(mods.subsetOf(Set("image", "audio")))
  }

  test("decodeFeatures is deterministic, batched, and feature-normalized") {
    val a = Multimodal.decodeFeatures(spark, sfDir).collect()
    val b = Multimodal.decodeFeatures(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq, "stub decode must be deterministic")
    assert(a.length == 500)
    a.take(20).foreach { r =>
      // digest is 32-hex of the feature vector; stats summarize a
      // normalized histogram (mean * dim == sum ~= 1)
      assert(r.getAs[String]("feat_md5").matches("[0-9a-f]{32}"))
      val mean = r.getAs[Double]("feat_mean")
      val sum = mean * Multimodal.featureDim
      assert(sum > 0.99 && sum < 1.01, s"histogram must normalize, got $sum")
      assert(r.getAs[Double]("feat_min") <= mean && mean <= r.getAs[Double]("feat_max"))
    }
  }

  test("sampleFrames bounds the explode factor and offsets are consistent") {
    val frames = Multimodal.sampleFrames(spark, sfDir, everyN = 64, maxFrames = 8).collect()
    val byDoc = frames.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.values.forall(_.length <= 8))
    frames.take(50).foreach { r =>
      assert(r.getAs[Int]("frame_offset") == r.getAs[Int]("frame_idx") * 64)
      assert(r.getAs[String]("frame_md5").length == 32)
    }
  }

  test("compression ratio is deterministic and low for repetitive text") {
    val a = TextAnalysis.compressionRatio(spark, sfDir).collect()
    val b = TextAnalysis.compressionRatio(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq, "deflate kernel must be deterministic")
    assert(a.length == 500)
    a.foreach { r =>
      val ratio = r.getDouble(3)
      assert(ratio > 0.0 && ratio <= 1.5, s"doc ${r.getLong(0)} ratio $ratio out of range")
    }
  }

  test("metaStats prunes the payload column at the scan (columnar projection)") {
    val plan = Multimodal.metaStats(spark, sfDir).queryExecution.executedPlan.toString
    // the parquet scan must read only the columns the metadata needs
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("text") || plan.contains("octet_length"),
      "payload (text) bytes may only appear inside the length projection")
    val rows = Multimodal.metaStats(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == 500)
  }

  test("mm6: block near-dup pairs are canonical with containment in (0, 1]") {
    val r = Multimodal.blockNearDup(spark, sfDir).collect()
    r.foreach { row =>
      assert(row.getAs[Long]("doc_a") < row.getAs[Long]("doc_b"))
      assert(row.getAs[Long]("n_shared") >= 1)
      val c = row.getAs[Double]("containment")
      assert(c > 0.0 && c <= 1.0, s"containment $c out of range")
    }
    // exact duplicates (mm5's class) must surface here with containment 1
    val exactDups = Multimodal.payloadDedup(spark, sfDir)
      .filter(col("n_copies") > 1).count()
    if (exactDups > 0) {
      assert(r.exists(_.getAs[Double]("containment") == 1.0),
        "exact payload copies must appear as full-containment pairs")
    }
  }
}
