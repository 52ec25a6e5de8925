package graft

/** Test helper: a SECOND PROCESS that grabs the store's cross-process
  * write lock (`root/_LOCK`, same FileChannel.lock the store takes in
  * GraphStore.withWriteLock) and holds it until killed. Java file locks
  * are fcntl record locks on Linux — held per-process — so only a real
  * subprocess exercises the cross-process exclusion path; an in-JVM
  * channel would throw OverlappingFileLockException instead of blocking.
  */
object LockHolderMain {
  def main(args: Array[String]): Unit = {
    val root = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(root)
    val ch = java.nio.channels.FileChannel.open(
      root.resolve("_LOCK"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    ch.lock()
    // signal the parent test that the lock is held
    System.out.println("LOCKED")
    System.out.flush()
    Thread.sleep(120000) // parent destroys us; process death releases the lock
  }
}
