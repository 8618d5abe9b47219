package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.collection.concurrent.TrieMap

/** Advisory per-table WRITER lock — the DML table-lock analog.
  *
  * The reference serializes all DML through table locks: DMLProc acquires
  * a table lock before any insert/update/delete and releases it at
  * commit/rollback (reference:
  * dbcon/dmlpackageproc/commandpackageprocessor.cpp:34 CLEANUP/table-lock
  * release path; versioning/BRM tablelockdata.h — lock state keyed by
  * table OID with owner/session/txn). Without it, two concurrent writers
  * interleaving Catalog's rename-aside swap can silently lose one
  * writer's batch (writer A swaps in a rewrite computed from a pre-B
  * snapshot, erasing B's committed rows).
  *
  * Two layers, both advisory (readers never block — MVCC semantics):
  *
  *  - in-process: one reentrant lock per (catalog root, table), so
  *    concurrent sessions/threads in one JVM serialize cheaply;
  *  - cross-process: a lock FILE at `<root>/_locks/<table>.lock`, claimed
  *    by hard-LINKING a pid-stamped temp file into place (link(2) fails
  *    atomically when the target exists, so exactly one process wins
  *    with its content already published). A claim whose owner pid is no
  *    longer alive is stale and is stolen — the analog of the
  *    reference's cleartablelock recovery after a DMLProc crash.
  *
  * At 100 TB the same protocol works unchanged when `<root>` is a shared
  * filesystem (HDFS/NFS): the lock file is O(bytes) regardless of table
  * size, and the hold time is the rewrite's commit window, not its scan.
  * (On S3-class stores without atomic rename one would swap this object
  * for a DynamoDB/ZK lock — the Catalog call sites stay identical.)
  */
object TableLocks {
  private val jvmLocks =
    TrieMap.empty[String, java.util.concurrent.locks.ReentrantLock]

  private def jvmLock(key: String) =
    jvmLocks.getOrElseUpdate(key,
      new java.util.concurrent.locks.ReentrantLock())

  private def lockFile(root: String, table: String): Path =
    Paths.get(root, "_locks", s"$table.lock")

  private def selfPid: Long = ProcessHandle.current().pid()

  /** Owner pid recorded in a claim file, if readable. */
  private def ownerPid(lock: Path): Option[Long] =
    try Some(Files.readString(lock).trim.split(" ")(0).toLong)
    catch { case _: Exception => None }

  /** True while a DIFFERENT live process (or a not-yet-readable claim)
    * holds the table's lock file. Used by the read path to distinguish
    * "a writer is mid-swap, wait for the live dir" from "a writer
    * crashed, run recovery". */
  def heldByOtherLiveOwner(root: String, table: String): Boolean = {
    val lf = lockFile(root, table)
    Files.exists(lf) && (ownerPid(lf) match {
      case Some(pid) =>
        pid != selfPid && ProcessHandle.of(pid).isPresent
      case None => Files.exists(lf) // claim mid-write: assume live
    })
  }

  /** Acquire the table's writer lock, run `f`, release. Reentrant within
    * a thread (upsert → rewrite style nesting takes it once). Throws
    * after `timeoutMs` if a live owner never releases. */
  def withLock[T](root: String, table: String,
      timeoutMs: Long = 60000)(f: => T): T = {
    val key = s"$root#$table"
    val jl = jvmLock(key)
    jl.lock()
    try {
      // already claimed the file at an outer nesting level in this thread
      if (jl.getHoldCount > 1) f
      else {
        val lf = lockFile(root, table)
        Files.createDirectories(lf.getParent)
        val deadline = System.nanoTime() + timeoutMs * 1000000L
        var claimed = false
        while (!claimed) {
          val tmp = lf.resolveSibling(
            s".claim_${table}_${selfPid}_${Thread.currentThread().getId}")
          Files.writeString(tmp, s"$selfPid ${System.currentTimeMillis()}\n")
          // publish the claim via hard LINK: link(2) fails with EEXIST
          // when the target exists, so exactly one process wins AND the
          // winner's content (pid + stamp) is in place atomically. A
          // rename would NOT work here — POSIX rename(2), which
          // ATOMIC_MOVE maps to, silently REPLACES an existing target,
          // letting every claimer "succeed" (caught by the cross-JVM
          // test in CatalogSpec).
          try {
            Files.createLink(lf, tmp)
            claimed = true
            Files.deleteIfExists(tmp)
          } catch {
            case e @ (_: java.nio.file.FileAlreadyExistsException |
                 _: java.nio.file.FileSystemException) =>
              Files.deleteIfExists(tmp)
              // only CONTENTION retries: a FileSystemException when the
              // lock file does NOT exist is the filesystem refusing
              // link(2) itself (hard links denied on some NFS/fuse/
              // container mounts) — retrying would spin for the whole
              // timeout and report a phantom "held by pid ?" instead of
              // the real capability error
              if (!e.isInstanceOf[java.nio.file.FileAlreadyExistsException]
                  && !Files.exists(lf))
                throw new IllegalStateException(
                  s"cannot claim table lock for $table: hard links appear " +
                    s"unsupported on ${lf.getParent} (${e.getMessage}); " +
                    "host the catalog on a filesystem with link(2) or " +
                    "swap TableLocks for an external lock service", e)
              val observed =
                try Some(Files.readString(lf)) catch { case _: Exception => None }
              val stale = observed.exists { s =>
                try {
                  val pid = s.trim.split(" ")(0).toLong
                  !ProcessHandle.of(pid).isPresent
                } catch { case _: Exception => false }
              }
              if (stale) {
                // stale claim from a dead writer — steal (the
                // cleartablelock analog). Guard against deleting a FRESH
                // claim that replaced the stale one since we read it:
                // re-read and delete only on byte-identical content (the
                // pid+millis stamp makes a colliding fresh claim
                // practically impossible); a lost race just retries.
                val now = try Some(Files.readString(lf))
                          catch { case _: Exception => None }
                if (now == observed) Files.deleteIfExists(lf)
              } else {
                if (System.nanoTime() > deadline)
                  throw new IllegalStateException(
                    s"timed out acquiring table lock for $table " +
                      s"(held by pid ${ownerPid(lf).getOrElse("?")})")
                Thread.sleep(20)
              }
          }
        }
        try f
        finally Files.deleteIfExists(lf)
      }
    } finally jl.unlock()
  }
}

/** Tiny main for the cross-process lock test: holds `table`'s lock under
  * `root` for `holdMillis`, touching `<root>/_locks/.holding_<table>`
  * while inside so the parent test can observe the hold window. No Spark
  * dependency — the lock layer is pure java.nio, which is the point: a
  * second JVM (a concurrent loader, a second session) contends through
  * the filesystem alone. */
object TableLockHolder {
  def main(args: Array[String]): Unit = {
    val Array(root, table, holdMillis) = args
    val flag = Paths.get(root, "_locks", s".holding_$table")
    TableLocks.withLock(root, table) {
      Files.createDirectories(flag.getParent)
      Files.writeString(flag, s"${ProcessHandle.current().pid()}\n")
      Thread.sleep(holdMillis.toLong)
      Files.deleteIfExists(flag)
    }
  }
}
