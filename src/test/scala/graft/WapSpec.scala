package graft

import graft.ops.Wap
import org.apache.spark.sql.functions._

/** Write–audit–publish (io17) and the versioned layout + time travel on
  * top of it (io18).
  */
class WapSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"wap_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "t").getAbsolutePath
  }

  private def read(p: String) = spark.read.parquet(p)

  test("replacing an existing dest is rename-aside, old data never lost") {
    val dest = tmp("replace")
    Wap.writeAuditPublish(Seq(1L, 2L).toDF("x"), dest)(_ => ())
    Wap.writeAuditPublish(Seq(10L, 20L, 30L).toDF("x"), dest)(_ => ())
    assert(read(dest).count() == 3)
    // no .replaced-* leftover after a clean replace
    val parent = new java.io.File(dest).getParentFile
    assert(!parent.listFiles().exists(_.getName.contains(".replaced-")))
  }

  test("failing audit on a replace keeps the published dataset intact") {
    val dest = tmp("auditfail")
    Wap.writeAuditPublish(Seq(1L, 2L).toDF("x"), dest)(_ => ())
    val e = intercept[IllegalStateException] {
      Wap.writeAuditPublish(Seq(99L).toDF("x"), dest)(_ =>
        require(false, "forced"))
    }
    assert(e.getMessage.contains("publish aborted"))
    assert(read(dest).as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("versioned publish mints v=1, v=2 and swaps the pointer (io18)") {
    val root = tmp("versioned")
    val v1 = Wap.Versioned.publishVersion(Seq(1L, 2L).toDF("x"), root)(_ => ())
    val v2 = Wap.Versioned.publishVersion(Seq(10L, 20L, 30L).toDF("x"),
      root)(_ => ())
    assert(v1 == 1L && v2 == 2L)
    assert(Wap.Versioned.currentVersion(spark, root).contains(2L))
    // current read follows the pointer; time travel reads v=1 unchanged
    assert(Wap.Versioned.readVersion(spark, root).count() == 3)
    assert(Wap.Versioned.readVersion(spark, root, Some(1L))
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // missing versions refuse loudly, listing what is published
    val e = intercept[IllegalArgumentException](
      Wap.Versioned.readVersion(spark, root, Some(7L)).count())
    assert(e.getMessage.contains("v=1") && e.getMessage.contains("v=2"))
  }

  test("failing audit leaves pointer and published versions untouched") {
    val root = tmp("vfail")
    Wap.Versioned.publishVersion(Seq(1L).toDF("x"), root)(_ => ())
    intercept[IllegalStateException] {
      Wap.Versioned.publishVersion(Seq(2L).toDF("x"), root)(_ =>
        require(false, "forced"))
    }
    assert(Wap.Versioned.currentVersion(spark, root).contains(1L))
    assert(Wap.Versioned.readVersion(spark, root).count() == 1)
    // the aborted version number is SKIPPED by the next publish (the
    // staged dir is kept for inspection, never reused)
    val v = Wap.Versioned.publishVersion(Seq(3L, 4L).toDF("x"), root)(_ => ())
    assert(v >= 2L && Wap.Versioned.readVersion(spark, root).count() == 2)
  }

  test("an orphaned v=N dir (crash before pointer swap) is never reused") {
    val root = tmp("orphan")
    Wap.Versioned.publishVersion(Seq(1L).toDF("x"), root)(_ => ())
    // simulate: a publish wrote v=2 but crashed before the pointer swap
    Seq(9L).toDF("x").write.parquet(s"$root/v=2")
    assert(Wap.Versioned.currentVersion(spark, root).contains(1L))
    val v = Wap.Versioned.publishVersion(Seq(5L, 6L).toDF("x"), root)(_ => ())
    assert(v == 3L) // the orphan is skipped, not overwritten
    assert(Wap.Versioned.readVersion(spark, root)
      .as[Long].collect().sorted.toSeq == Seq(5L, 6L))
    // the orphan remains readable as a (never-live) historical artifact
    assert(Wap.Versioned.readVersion(spark, root, Some(2L)).count() == 1)
  }

  test("retention sweep expires old versions, never the pointer (io19)") {
    val root = tmp("expire")
    (1 to 4).foreach(i =>
      Wap.Versioned.publishVersion(Seq.fill(i)(i.toLong).toDF("x"),
        root)(_ => ()))
    val gone = Wap.Versioned.expireVersions(spark, root, keepLast = 2)
    assert(gone == Seq(1L, 2L))
    assert(Wap.Versioned.readVersion(spark, root, Some(3L)).count() == 3)
    assert(Wap.Versioned.readVersion(spark, root).count() == 4)
    val e = intercept[IllegalArgumentException](
      Wap.Versioned.readVersion(spark, root, Some(1L)).count())
    assert(e.getMessage.contains("not published"))
    // a pinned live version survives even when the window passes it:
    // simulate a pointer parked at v=3 (reader pin), sweep keepLast=1.
    // Written through the Hadoop fs (a raw java.nio write would strand
    // the LocalFileSystem's CRC sidecar)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val po = fs.create(new org.apache.hadoop.fs.Path(root, "_CURRENT"), true)
    try po.write("3".getBytes) finally po.close()
    val gone2 = Wap.Versioned.expireVersions(spark, root, keepLast = 1)
    assert(gone2 == Seq()) // v=3 is live, v=4 is in the keep window
    assert(Wap.Versioned.readVersion(spark, root).count() == 3)
  }
}
