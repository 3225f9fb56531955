package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Retention/GC semantics of the versioned model-artifact store — the
  * failure modes the n127 in-query requires don't cover: pruning
  * bounds, the never-written pinned read, idempotence, and that
  * loadLatest keeps serving across a prune.
  */
class ArtifactRetentionSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSpark.spark
  private val M = graft.operators.ModelArtifacts

  private var base: java.io.File = _
  override def beforeAll(): Unit = {
    super.beforeAll()
    base = java.nio.file.Files.createTempDirectory("graft_retention_").toFile
  }
  override def afterAll(): Unit = {
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmTree))
      f.delete(); ()
    }
    rmTree(base)
    super.afterAll()
  }

  private def freshStore(name: String, versions: Int*): String = {
    val dir = new java.io.File(base, name).getAbsolutePath
    versions.foreach { v =>
      M.writeVersion(
        spark.range(1).select(lit(s"model_v$v").as("payload")), dir, v)
    }
    dir
  }

  test("pruneVersions keeps exactly the newest K and reports the drops") {
    val dir = freshStore("prune3", 1, 2, 3, 4)
    assert(M.pruneVersions(spark, dir, keepLatestK = 2) == Seq(1, 2))
    assert(M.listVersions(spark, dir) == Seq(3, 4))
    // idempotent: nothing left to drop at the same K
    assert(M.pruneVersions(spark, dir, keepLatestK = 2) == Seq.empty)
    // K beyond the population drops nothing
    assert(M.pruneVersions(spark, dir, keepLatestK = 10) == Seq.empty)
    assert(M.listVersions(spark, dir) == Seq(3, 4))
  }

  test("loadLatest keeps serving the surviving newest version across a prune") {
    val dir = freshStore("latest", 1, 2)
    M.pruneVersions(spark, dir, keepLatestK = 1)
    val r = M.loadLatest(spark, dir).select("payload", "version").head()
    assert((r.getString(0), r.getInt(1)) == ("model_v2", 2))
  }

  test("a pinned read of a pruned version fails loudly, naming the survivors") {
    val dir = freshStore("pinned", 1, 2, 3)
    M.pruneVersions(spark, dir, keepLatestK = 2)
    val e = intercept[IllegalArgumentException](M.loadVersion(spark, dir, 1))
    assert(e.getMessage.contains("version 1") &&
      e.getMessage.contains("2, 3"),
      s"failure must name the missing version and survivors: ${e.getMessage}")
    // the surviving pin still reads clean
    assert(M.loadVersion(spark, dir, 2).count() == 1L)
  }

  test("a pinned read of a never-written version fails the same way") {
    val dir = freshStore("never", 1)
    intercept[IllegalArgumentException](M.loadVersion(spark, dir, 7))
  }

  test("degenerate inputs: keepLatestK < 1 refused; empty store lists empty") {
    val dir = freshStore("degenerate", 1)
    intercept[IllegalArgumentException](
      M.pruneVersions(spark, dir, keepLatestK = 0))
    assert(M.listVersions(spark,
      new java.io.File(base, "does_not_exist").getAbsolutePath) == Seq.empty)
  }
}
