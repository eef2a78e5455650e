package graft

import java.nio.file.Files
import graft.sources.Ingest

/** S7 fetch-iff-changed semantics against a local "remote" directory —
  * no network (the reference's flow at download_script.py:170-217).
  */
class IngestSpec extends SparkTestBase {

  private def conf = spark.sparkContext.hadoopConfiguration

  test("fetch + verify + skip-when-unchanged + refetch-when-corrupted") {
    val tmp = Files.createTempDirectory("graft-ingest-util")
    val remote = tmp.resolve("remote/db.sqlite")
    Files.createDirectories(remote.getParent)
    val payload = ("synonymizer dump " * 1000).getBytes("UTF-8")
    Files.write(remote, payload)
    val local = tmp.resolve("local/db.sqlite").toString
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest(payload).map("%02x".format(_)).mkString

    // first call: transfers and verifies; progress strictly increasing
    var lastProgress = 0L
    val r1 = Ingest.ensureFetchedAndVerified(conf, remote.toString, local,
      p => { assert(p > lastProgress || p == lastProgress); lastProgress = p })
    assert(r1.fetched && r1.sha256 == expected)
    assert(lastProgress == payload.length.toLong)
    assert(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(local)).sameElements(payload))

    // second call: local hash matches remote → skip (no transfer)
    val r2 = Ingest.ensureFetchedAndVerified(conf, remote.toString, local)
    assert(!r2.fetched && r2.sha256 == expected)

    // corrupt the local copy → hash mismatch → refetch and repair
    Files.write(java.nio.file.Paths.get(local), "garbage".getBytes)
    val r3 = Ingest.ensureFetchedAndVerified(conf, remote.toString, local)
    assert(r3.fetched && r3.sha256 == expected)
    assert(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(local)).sameElements(payload))

    // remote changes → local is stale → refetch picks up the new bytes
    val payload2 = "a brand new dump".getBytes("UTF-8")
    Files.write(remote, payload2)
    val r4 = Ingest.ensureFetchedAndVerified(conf, remote.toString, local)
    assert(r4.fetched)
    assert(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(local)).sameElements(payload2))
  }
}
