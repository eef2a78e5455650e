package graft.sources

import java.security.MessageDigest
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** S7-shaped ingestion utility (SURVEY §2.1): fetch-iff-changed with
  * SHA-256 verification, mirroring the reference's
  * `ensure_downloaded_and_verified` (download_script.py:170-217) over
  * Hadoop FileSystems instead of SFTP — any scheme the active Hadoop
  * conf resolves (file://, hdfs://, s3a://, ...) works on both sides,
  * which is the cluster-native equivalent of the reference's
  * ssh+sftp transport:
  *
  *  1. compute the remote file's SHA-256 (streamed, bounded memory);
  *  2. if the local file exists and its SHA-256 matches → skip;
  *  3. otherwise stream-copy remote → local (progress callback per
  *     buffer, the pbar hook) and re-hash the local copy;
  *  4. a post-copy mismatch raises — a torn transfer must not be
  *     silently trusted (download_script.py:207-213).
  *
  * Driver-side by design: this runs once before a job, like the
  * reference's step 0 — it is an ingestion UTILITY, not a distributed
  * operator. (On object stores with published checksums you'd compare
  * the sidecar hash instead of streaming the remote; the streamed hash
  * is the transport-agnostic fallback the reference also uses.)
  */
object Ingest {

  final case class FetchResult(fetched: Boolean, sha256: String)

  def sha256(fs: FileSystem, p: Path): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) md.update(buf, 0, n)
        n = in.read(buf)
      }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** Fetch `remote` to `local` iff the local copy is missing or its
    * hash differs; returns whether a transfer happened and the verified
    * hash. `progress` receives cumulative bytes copied.
    */
  def ensureFetchedAndVerified(conf: Configuration, remote: String,
                               local: String,
                               progress: Long => Unit = _ => ())
      : FetchResult = {
    val rPath = new Path(remote)
    val lPath = new Path(local)
    val rFs = rPath.getFileSystem(conf)
    val lFs = lPath.getFileSystem(conf)
    val remoteHash = sha256(rFs, rPath)
    // an unreadable local copy (e.g. a Hadoop CRC sidecar mismatch after
    // torn/out-of-band writes) is as stale as a hash mismatch: refetch
    val upToDate = lFs.exists(lPath) && lFs.getFileStatus(lPath).isFile &&
      scala.util.Try(sha256(lFs, lPath))
        .toOption.exists(_.equalsIgnoreCase(remoteHash))
    if (upToDate) FetchResult(fetched = false, remoteHash)
    else {
      val in = rFs.open(rPath)
      try {
        val out = lFs.create(lPath, true)
        try {
          val buf = new Array[Byte](1 << 16)
          var total = 0L
          var n = in.read(buf)
          while (n >= 0) {
            if (n > 0) {
              out.write(buf, 0, n)
              total += n
              progress(total)
            }
            n = in.read(buf)
          }
        } finally out.close()
      } finally in.close()
      val localHash = sha256(lFs, lPath)
      if (!localHash.equalsIgnoreCase(remoteHash))
        throw new IllegalStateException(
          "Hash verification failed after download.\n" +
            s"Local:  $localHash\nRemote: $remoteHash")
      FetchResult(fetched = true, remoteHash)
    }
  }

  final case class ExtractedEntry(name: String, bytes: Long, sha256: String)

  /** S8-shaped archive extraction (download_data.sh:1-20: the reference's
    * first command unzips the DrugBank release zip): stream the archive's
    * entries out of any Hadoop FileSystem and write them under `destDir`,
    * hashing each entry DURING the copy and re-hashing the written file
    * after — the same verify-after-transfer stance as
    * [[ensureFetchedAndVerified]], applied per entry. Entry names are
    * confined to `destDir` (zip-slip names raise), directory entries are
    * skipped, `entryFilter` selects by name.
    */
  def extractZip(conf: Configuration, archive: String, destDir: String,
                 entryFilter: String => Boolean = _ => true)
      : Seq[ExtractedEntry] = {
    val aPath = new Path(archive)
    val dPath = new Path(destDir)
    val aFs = aPath.getFileSystem(conf)
    val dFs = dPath.getFileSystem(conf)
    dFs.mkdirs(dPath)
    val zin = new java.util.zip.ZipInputStream(aFs.open(aPath))
    try {
      val out = Seq.newBuilder[ExtractedEntry]
      var entry = zin.getNextEntry
      while (entry != null) {
        if (!entry.isDirectory && entryFilter(entry.getName)) {
          val name = entry.getName
          if (name.split('/').contains("..") ||
              name.startsWith("/") || name.contains(":"))
            throw new IllegalArgumentException(
              s"archive entry escapes the destination directory: $name")
          out += writeVerified(dFs, new Path(dPath, name), zin)
            .copy(name = name)
        }
        zin.closeEntry()
        entry = zin.getNextEntry
      }
      out.result()
    } finally zin.close()
  }

  /** Single-file gzip extraction with the same verify-after pattern. */
  def extractGzip(conf: Configuration, archive: String, local: String)
      : ExtractedEntry = {
    val aPath = new Path(archive)
    val lPath = new Path(local)
    val aFs = aPath.getFileSystem(conf)
    val lFs = lPath.getFileSystem(conf)
    val gin = new java.util.zip.GZIPInputStream(aFs.open(aPath))
    try writeVerified(lFs, lPath, gin).copy(name = lPath.getName)
    finally gin.close()
  }

  /** Stream `in` to `target`, hashing in-flight; re-hash the written
    * file and raise on mismatch (a torn write must not be trusted).
    */
  private def writeVerified(fs: FileSystem, target: Path,
                            in: java.io.InputStream): ExtractedEntry = {
    val md = MessageDigest.getInstance("SHA-256")
    var total = 0L
    val out = fs.create(target, true)
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) {
          md.update(buf, 0, n)
          out.write(buf, 0, n)
          total += n
        }
        n = in.read(buf)
      }
    } finally out.close()
    val streamed = md.digest().map("%02x".format(_)).mkString
    val written = sha256(fs, target)
    if (!written.equalsIgnoreCase(streamed))
      throw new IllegalStateException(
        s"Hash verification failed after extraction of $target.\n" +
          s"Written:  $written\nStreamed: $streamed")
    ExtractedEntry(target.getName, total, streamed)
  }
}
