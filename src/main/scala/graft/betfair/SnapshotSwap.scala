package graft.betfair

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe snapshot-swap primitive shared by the batch engine
  * ([[BetfairDatabase]]) and the streaming indexer
  * (graft.streaming.StreamOps.continuousIndex).
  *
  * Publishing retires the live snapshot by RENAME (never delete): a crash
  * between the two renames leaves a complete `_old` copy, which [[recover]]
  * restores on the next read/batch. Both renames are checked; every step is
  * idempotent on re-run (SURVEY.md §7.3).
  */
object SnapshotSwap {

  /** Restore a retired snapshot if a previous swap crashed between retiring
    * the live dir and publishing the new one. No-op otherwise.
    */
  def recover(fs: FileSystem, live: Path, retired: Path): Unit =
    if (!fs.exists(live) && fs.exists(retired) && !fs.rename(retired, live))
      throw new java.io.IOException(
        s"snapshot recover: cannot restore $retired to $live")

  /** Swap `tmp` (a fully-written new snapshot) into place as `live`:
    * retire-by-rename, publish-by-rename, then drop the retired copy.
    */
  def publish(fs: FileSystem, tmp: Path, live: Path, retired: Path): Unit = {
    if (fs.exists(retired)) fs.delete(retired, true)
    if (fs.exists(live) && !fs.rename(live, retired))
      throw new java.io.IOException(s"snapshot swap: cannot retire $live")
    if (!fs.rename(tmp, live))
      throw new java.io.IOException(s"snapshot swap: cannot publish $tmp")
    fs.delete(retired, true)
  }
}
