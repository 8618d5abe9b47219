package graft.sources

/** Spawns a cooperating child JVM with the Spark-on-JDK17 `--add-opens`
  * set, stdout drained to a daemon thread (an undrained pipe deadlocks
  * the child once the buffer fills). One copy of the classpath
  * resolution / module-opens / ProcessBuilder boilerplate, shared by
  * the bench's writer-crash soak cycle and the two-JVM spec tests
  * (Catalog crash recovery, ANN maintenance contention) — a future
  * JDK's new `--add-opens` entry or a classpath fix lands once instead
  * of silently diverging across call sites.
  *
  * CLASSPATH (round 11, after two driver rounds of the crash drill's
  * child dying at classload — BENCH_r9/r10 `soak_crash.staged:false`,
  * `child_exit:1`, ClassNotFound frames in the tail): the child gets
  * the UNION of every classpath source this process can see —
  *
  *  - `java.class.path` verbatim entries (what the launcher that
  *    started US was actually given: sbt's fork enumerates the full
  *    runtime classpath there, a plain `java -cp` run carries it too);
  *  - the code-source of graft's own classes, of SparkSession, and of
  *    scala-library (covers launchers whose `java.class.path` is just
  *    a bootstrap jar, e.g. a non-forked sbt or a custom harness);
  *  - with every `dir`-slash-star wildcard (from either source) EXPANDED to the
  *    explicit jar list, and the parent DIRECTORY of a Spark jar
  *    enumerated too — so no child ever depends on launcher-side glob
  *    expansion semantics.
  *
  * The whole option block rides an @argfile: a 100-jar explicit
  * classpath exceeds no limit there, quoting is deterministic, and the
  * command line the parent constructs is three tokens (`java @file
  * main args…`) regardless of environment. `describeClasspath` is
  * printed into any staging-failure diagnosis so a wrong classpath
  * names itself in the artifact instead of needing forensics.
  *
  * The drain keeps a bounded in-memory TAIL of the child's merged
  * stdout+stderr. `tail()` is safe to call at any time, including
  * after the child exits or is killed; `firstError` pulls the first
  * exception/error line out of a captured tail — the line that names
  * WHICH class failed, which a tail-only truncation drops (round 10's
  * 160-char tail kept "…2 more" and lost the class name).
  */
object ChildJvm {
  /** A spawned child plus accessors for its captured output tail. */
  final case class Spawned(proc: Process, tail: () => String) {
    def isAlive: Boolean = proc.isAlive
    def destroyForcibly(): Process = proc.destroyForcibly()
    def waitFor(): Int = proc.waitFor()
  }

  private def srcOf(c: Class[_]): Option[String] =
    try Option(c.getProtectionDomain.getCodeSource).map(s =>
      java.nio.file.Paths.get(s.getLocation.toURI).toString)
    catch { case _: Exception => None }

  /** Expand one classpath entry: a `dir`-slash-star wildcard becomes the sorted
    * explicit jar list (the child must never depend on who expands the
    * glob); anything else passes through. */
  private def expand(entry: String): Seq[String] =
    if (entry.endsWith("/*") || entry.endsWith("\\*")) {
      val dir = java.nio.file.Paths.get(entry.dropRight(2))
      jarsIn(dir)
    } else Seq(entry)

  private def jarsIn(dir: java.nio.file.Path): Seq[String] =
    if (!java.nio.file.Files.isDirectory(dir)) Seq.empty
    else scala.util.Using.resource(java.nio.file.Files.list(dir)) { st =>
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.map(_.toString)
        .filter(_.endsWith(".jar")).toSeq.sorted
    }

  /** The union child classpath, resolved once per spawn (cheap: one
    * directory listing). Order: inherited entries first (they were
    * good enough to start US), then the code-source-derived ones. */
  private[graft] def childClasspath(): Seq[String] = {
    val inherited = System.getProperty("java.class.path", "")
      .split(java.io.File.pathSeparatorChar).toSeq
      .filter(_.nonEmpty).flatMap(expand)
    val own = srcOf(ChildJvm.getClass).toSeq
    val spark = srcOf(classOf[org.apache.spark.sql.SparkSession]).toSeq
      .flatMap { s =>
        if (s.endsWith(".jar"))
          jarsIn(java.nio.file.Paths.get(s).getParent)
        else Seq(s)
      }
    val scalaLib = srcOf(classOf[scala.Option[_]]).toSeq
    (inherited ++ own ++ spark ++ scalaLib).distinct
      .filter(e => java.nio.file.Files.exists(java.nio.file.Paths.get(e)))
  }

  /** One-line summary of the classpath a child would get — printed
    * into staging-failure diagnostics so a wrong resolution names
    * itself in the artifact of record. */
  def describeClasspath(): String = {
    val cp = childClasspath()
    val jars = cp.count(_.endsWith(".jar"))
    val dirs = cp.filterNot(_.endsWith(".jar"))
    s"${cp.size} entries ($jars jars; dirs: ${dirs.mkString(",").take(300)})"
  }

  /** First line of `tail` that names an exception/error — the
    * diagnosis a bounded tail-only truncation loses. */
  def firstError(tail: String): String =
    tail.linesIterator.find(l =>
        l.contains("Exception") || l.contains("Error") ||
          l.contains("Could not find or load"))
      .getOrElse("").take(300)

  /** Argfile token: quoted per the java @argfile grammar (backslash
    * escapes inside double quotes). */
  private def argQuote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  def spawn(mainClass: String, args: Seq[String],
      env: Map[String, String] = Map.empty,
      sysProps: Seq[String] = Seq.empty,
      maxHeap: String = "3g"): Spawned = {
    val cp = childClasspath().mkString(java.io.File.pathSeparator)
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val addOpens = Seq("java.lang", "java.lang.invoke",
      "java.lang.reflect", "java.io", "java.net", "java.nio",
      "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
    val opts = addOpens ++ Seq(s"-Xmx$maxHeap") ++ sysProps ++
      Seq("-cp", cp)
    val argfile = java.nio.file.Files.createTempFile("graft_child", ".args")
    argfile.toFile.deleteOnExit()
    java.nio.file.Files.writeString(argfile,
      opts.map(argQuote).mkString("\n") + "\n")
    val pb = new ProcessBuilder(
        (Seq(javaBin, s"@$argfile", mainClass) ++ args): _*)
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

  /** Spawn the classload probe child and wait for it: returns "ok" or
    * a compact failure description (exit code + first error line).
    * Cheap (no SparkSession starts — Class.forName only), so a
    * staging failure's diagnosis can say whether the HARNESS (child
    * classpath) or the DRILL (Spark startup, parking) is at fault. */
  def probe(timeoutMs: Long = 60000): String =
    try {
      val p = spawn("graft.sources.ChildClassProbe", Seq.empty,
        maxHeap = "256m")
      val done = p.proc.waitFor(timeoutMs,
        java.util.concurrent.TimeUnit.MILLISECONDS)
      if (!done) { p.destroyForcibly(); "probe timeout" }
      else if (p.proc.exitValue() == 0 && p.tail().contains("CHILD_PROBE_OK"))
        "ok"
      else s"exit=${p.proc.exitValue()} ${firstError(p.tail())}"
    } catch { case e: Exception => s"spawn failed: $e" }
}

/** Classload canary for ChildJvm.probe: loads the classes the crash
  * drill's child (SoakCrashWriter) needs — graft's own code, Spark SQL,
  * and scala-library — WITHOUT starting a SparkSession, then prints a
  * marker. Failing here isolates a classpath-propagation bug from a
  * Spark-startup one in the drill's self-diagnosis. */
object ChildClassProbe {
  def main(args: Array[String]): Unit = {
    Seq("org.apache.spark.sql.SparkSession",
      "org.apache.spark.sql.functions$",
      "graft.sources.SoakCrashWriter",
      "graft.sources.Catalog",
      "scala.collection.immutable.List")
      .foreach(Class.forName)
    println("CHILD_PROBE_OK")
  }
}
