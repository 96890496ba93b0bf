package graft.streaming

/** Bridges single read-only data FILES to Spark's directory-based file
  * stream source: the source requires a directory (it infers basePath and
  * watches it for new files), so the file is exposed through a per-file
  * symlink directory under java.io.tmpdir. Idempotent; concurrent
  * creators tolerate the already-exists race.
  */
object Replay {

  /** A directory containing (a symlink to) exactly the given file,
    * suitable as a file-stream source path.
    */
  def linkDir(file: String): String = {
    import java.nio.file.{Files, Paths}
    val src = Paths.get(file).toAbsolutePath
    val d = Paths.get(sys.props("java.io.tmpdir"),
      "graft_stream_" + java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(src.toString).toLong & 0xffffffffL))
    Files.createDirectories(d)
    val link = d.resolve(src.getFileName)
    if (!Files.exists(link))
      try Files.createSymbolicLink(link, src)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    d.toString
  }
}
