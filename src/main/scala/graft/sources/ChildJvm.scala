package graft.sources

/** Spawns a cooperating child JVM on this process's own classpath with
  * the Spark-on-JDK17 `--add-opens` set, stdout drained to a daemon
  * thread (an undrained pipe deadlocks the child once the buffer
  * fills). One copy of the classpath resolution / module-opens /
  * ProcessBuilder boilerplate, shared by the bench's writer-crash soak
  * cycle and the two-JVM spec tests (Catalog crash recovery, ANN
  * maintenance contention) — a future JDK's new `--add-opens` entry or
  * a classpath fix (like the existing jar-vs-directory branch) lands
  * once instead of silently diverging across call sites.
  *
  * The drain keeps a bounded in-memory TAIL of the child's merged
  * stdout+stderr (round 9's drain went to the null stream, so a child
  * that died at startup left ZERO diagnostics — the driver's soak_fail
  * verdict required forensics on a gitignored file). `tail()` is safe
  * to call at any time, including after the child exits or is killed.
  */
object ChildJvm {
  /** A spawned child plus accessors for its captured output tail. */
  final case class Spawned(proc: Process, tail: () => String) {
    def isAlive: Boolean = proc.isAlive
    def destroyForcibly(): Process = proc.destroyForcibly()
    def waitFor(): Int = proc.waitFor()
  }

  def spawn(mainClass: String, args: Seq[String],
      env: Map[String, String] = Map.empty,
      sysProps: Seq[String] = Seq.empty,
      maxHeap: String = "3g"): Spawned = {
    def srcOf(c: Class[_]) = java.nio.file.Paths.get(
      c.getProtectionDomain.getCodeSource.getLocation.toURI).toString
    val sparkSrc = srcOf(classOf[org.apache.spark.sql.SparkSession])
    val cp = Seq(
      srcOf(ChildJvm.getClass), // graft's compiled classes
      if (sparkSrc.endsWith(".jar"))
        java.nio.file.Paths.get(sparkSrc).getParent.toString + "/*"
      else sparkSrc,
      srcOf(classOf[scala.Option[_]])) // scala-library when separate
      .mkString(java.io.File.pathSeparator)
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val addOpens = Seq("java.lang", "java.lang.invoke",
      "java.lang.reflect", "java.io", "java.net", "java.nio",
      "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
    val pb = new ProcessBuilder((Seq(javaBin) ++ addOpens ++
      Seq(s"-Xmx$maxHeap") ++ sysProps ++
      Seq("-cp", cp, mainClass) ++ args): _*)
      .redirectErrorStream(true)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    val proc = pb.start()
    // bounded tail of the merged child output: last `cap` chars survive
    // in memory, everything older is dropped — enough to carry a crash
    // stack or a startup error into a failure message without ever
    // growing with a chatty child
    val cap = 8192
    val buf = new StringBuilder
    def append(s: String): Unit = buf.synchronized {
      buf.append(s)
      if (buf.length > cap) buf.delete(0, buf.length - cap)
    }
    val drain = new Thread(() => {
      val in = proc.getInputStream
      val chunk = new Array[Byte](4096)
      try {
        var n = in.read(chunk)
        while (n >= 0) {
          if (n > 0)
            append(new String(chunk, 0, n,
              java.nio.charset.StandardCharsets.UTF_8))
          n = in.read(chunk)
        }
      } catch { case _: Throwable => }
    }, s"childjvm-drain-$mainClass")
    drain.setDaemon(true)
    drain.start()
    Spawned(proc, () => buf.synchronized(buf.toString))
  }
}
