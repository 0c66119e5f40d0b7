package graft.maintenance

import java.nio.file.Files

import graft.SparkTestBase
import graft.sources.MutableTable
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class MaintenanceSpec extends SparkTestBase {

  private val schema = StructType(Seq(StructField("id", LongType)))

  private def mkTable() = {
    val dir = Files.createTempDirectory("graft_maint").resolve("t").toString
    val t = MutableTable.create(spark, dir, schema)
    (1 to 6).foreach { i =>
      t.insert(spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(i.toLong)), 1), schema))
    }
    t
  }

  test("tick checkpoints tables whose interval elapsed (mod.rs:24-223)") {
    val t = mkTable()
    assert(t.fileCount == 6)
    val m = new Maintenance(intervalMillis = 1000)
    m.register("t", t, targetFiles = 1)
    assert(m.tick(nowMillis = 10000) == Seq("t"))
    assert(t.fileCount == 1)
    assert(t.df.count() == 6)
    // within the interval: no re-checkpoint
    assert(m.tick(nowMillis = 10500).isEmpty)
    // after the interval: runs again (no-op compaction, files already =1)
    assert(m.tick(nowMillis = 11500) == Seq("t"))
  }

  test("advisory lock: second holder skips (lock.rs try-lock semantics)") {
    val t = mkTable()
    val m = new Maintenance()
    val outer = m.withAdvisoryLock(t.root) {
      // same-process relock via a second channel is non-blocking denied on
      // POSIX only across processes; emulate contention by asserting the
      // inner call either skips (None) or would have to wait — the
      // OverlappingFileLockException maps to "skip"
      try m.withAdvisoryLock(t.root)(fail("inner lock must not be granted"))
      catch { case _: java.nio.channels.OverlappingFileLockException => None }
    }
    assert(outer.contains(None))
  }

  test("checkpoint registry records completion times (ducklake_checkpoints analogue)") {
    val t = mkTable()
    val m = new Maintenance(intervalMillis = 1)
    m.register("reg", t)
    assert(m.lastCheckpointAt("reg").isEmpty)
    m.tick(nowMillis = 42)
    assert(m.lastCheckpointAt("reg").contains(42L))
  }
}
