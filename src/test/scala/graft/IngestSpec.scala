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

  test("S8 zip extraction: entries land under destDir, hashed and " +
       "verified; zip-slip names raise; gzip single-file path") {
    val tmp = Files.createTempDirectory("graft-ingest-zip")
    val xml = ("<drug><name>Aspirin</name></drug>" * 500).getBytes("UTF-8")
    val readme = "see terms".getBytes("UTF-8")
    val archive = tmp.resolve("release.zip")
    val zout = new java.util.zip.ZipOutputStream(
      Files.newOutputStream(archive))
    zout.putNextEntry(new java.util.zip.ZipEntry("data/full database.xml"))
    zout.write(xml); zout.closeEntry()
    zout.putNextEntry(new java.util.zip.ZipEntry("README.txt"))
    zout.write(readme); zout.closeEntry()
    zout.putNextEntry(new java.util.zip.ZipEntry("empty-dir/"))
    zout.closeEntry()
    zout.close()

    val dest = tmp.resolve("out").toString
    val entries = Ingest.extractZip(conf, archive.toString, dest)
      .map(e => e.name -> e).toMap
    assert(entries.keySet == Set("data/full database.xml", "README.txt"))
    val expectedXmlHash = java.security.MessageDigest.getInstance("SHA-256")
      .digest(xml).map("%02x".format(_)).mkString
    assert(entries("data/full database.xml").sha256 == expectedXmlHash)
    assert(entries("data/full database.xml").bytes == xml.length.toLong)
    assert(Files.readAllBytes(
      java.nio.file.Paths.get(dest, "data/full database.xml"))
      .sameElements(xml))
    assert(Files.readAllBytes(java.nio.file.Paths.get(dest, "README.txt"))
      .sameElements(readme))

    // entry filter: only the xml
    val onlyXml = Ingest.extractZip(conf, archive.toString,
      tmp.resolve("out2").toString, _.endsWith(".xml"))
    assert(onlyXml.map(_.name) == Seq("data/full database.xml"))

    // zip-slip: an entry trying to escape destDir must raise
    val evil = tmp.resolve("evil.zip")
    val zev = new java.util.zip.ZipOutputStream(Files.newOutputStream(evil))
    zev.putNextEntry(new java.util.zip.ZipEntry("../escape.txt"))
    zev.write("boom".getBytes); zev.closeEntry()
    zev.close()
    intercept[IllegalArgumentException] {
      Ingest.extractZip(conf, evil.toString, tmp.resolve("out3").toString)
    }
    assert(!Files.exists(tmp.resolve("escape.txt")))

    // gzip: single file, same verify-after pattern
    val gz = tmp.resolve("dump.xml.gz")
    val gzo = new java.util.zip.GZIPOutputStream(Files.newOutputStream(gz))
    gzo.write(xml); gzo.close()
    val g = Ingest.extractGzip(conf, gz.toString,
      tmp.resolve("dump.xml").toString)
    assert(g.sha256 == expectedXmlHash && g.bytes == xml.length.toLong)
    assert(Files.readAllBytes(tmp.resolve("dump.xml")).sameElements(xml))
  }
}
