package graft

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

import java.net.URI

/** A non-`file:` Hadoop scheme backed by local disk — the offline stand-in
  * for the reference's cloud coverage (tests/test_xdlake_cloud.py:15-127,
  * tests/test_storage.py:50-69 register a "mock://" filesystem the same
  * way). Registering it as `fs.mock.impl` routes every path of the form
  * `mock:/...` through the generic Hadoop FS dispatch — the exact code
  * path `s3a://`/`gs://`/`abfs://` take — so these tests prove the
  * Location/commit/scan/stats plumbing carries the scheme end-to-end and
  * nothing shortcuts to `java.io.File` or drops to a bare `file:` URI.
  *
  * `RawLocalFileSystem.create(path, overwrite = false)` fails on an
  * existing file like HDFS does, so the non-`file:` branch of
  * [[graft.storage.Location.createIfAbsent]] (the OCC commit primitive)
  * is genuinely exercised.
  */
class MockSchemeFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mock"
  override def getUri: URI = URI.create("mock:///")
}

object MockSchemeFileSystem {
  val Scheme = "mock"

  /** Register the scheme on a session's Hadoop conf (idempotent). */
  def register(conf: org.apache.hadoop.conf.Configuration): Unit = {
    conf.set("fs.mock.impl", classOf[MockSchemeFileSystem].getName)
    conf.set("fs.mock.impl.disable.cache", "false")
  }

  /** A fresh `mock:` URI over a local temp directory. */
  def tempPath(prefix: String): String =
    "mock:" + java.nio.file.Files.createTempDirectory(prefix).toString

  def assertAllMock(uris: Seq[String]): Unit = {
    val bad = uris.filterNot(_.startsWith("mock:"))
    assert(bad.isEmpty, s"non-mock URIs leaked out of a mock-scheme table: $bad")
  }
}
