package graft.lake

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Path}

/** The one no-overwrite-rename primitive both commit protocols build on
  * (LakeTable snapshot metas, RawAppendSink batch/compacted dirs —
  * previously two drifting copies of the same machinery).
  *
  * Semantics of [[renameNoOverwrite]]: atomically publish `tmp` as
  * `target`; returns true if THIS call won, false if `target` already
  * exists (the loser's `tmp` is deleted — replay/concurrent-commit case);
  * throws on any other IO failure. Uses FileContext's
  * `Options.Rename.NONE` when an AbstractFileSystem binding exists;
  * otherwise falls back to exists-check + rename with dir-into-dir
  * detection (a bare FileSystem.rename onto an existing DIRECTORY moves
  * the source INSIDE it — POSIX semantics — which the fallback undoes and
  * reports as a lost race).
  */
final class AtomicFs(fs: FileSystem, conf: Configuration) {

  // cached per instance: FileContext resolution is not free, and some
  // filesystems ship only a FileSystem impl (e.g. s3a without
  // fs.AbstractFileSystem.s3a.impl) — those fall back
  @transient private lazy val fileContext: Option[FileContext] =
    try Some(FileContext.getFileContext(fs.getUri, conf))
    catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException => None
    }

  /** Atomically REPLACE `target` with `tmp` (Options.Rename.OVERWRITE —
    * atomic on HDFS/local): for single-slot marker files whose readers
    * must never observe the slot absent. Where only a bare FileSystem
    * binding exists, falls back to delete+rename — the narrow
    * marker-absent crash window the primary path exists to remove.
    */
  def renameOverwrite(tmp: Path, target: Path): Unit =
    fileContext match {
      case Some(fc) =>
        fc.rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      case None =>
        fs.delete(target, false)
        if (!fs.rename(tmp, target))
          throw new java.io.IOException(
            s"atomic overwrite-rename failed: $tmp -> $target")
    }

  def renameNoOverwrite(tmp: Path, target: Path): Boolean =
    fileContext match {
      case Some(fc) =>
        try { fc.rename(tmp, target); true } // Options.Rename.NONE default
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException |
               _: java.nio.file.FileAlreadyExistsException |
               _: org.apache.hadoop.fs.ParentNotDirectoryException =>
            fs.delete(tmp, true); false
          case _: java.io.IOException if fs.exists(target) =>
            fs.delete(tmp, true); false
        }
      case None =>
        if (fs.exists(target)) { fs.delete(tmp, true); false }
        else if (fs.rename(tmp, target)) {
          val nested = new Path(target, tmp.getName)
          if (fs.exists(nested)) { fs.delete(nested, true); false } else true
        } else if (fs.exists(target)) { fs.delete(tmp, true); false }
        else throw new java.io.IOException(
          s"atomic rename failed: $tmp -> $target")
    }
}
