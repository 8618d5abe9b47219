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
  */
object ChildJvm {
  def spawn(mainClass: String, args: Seq[String],
      env: Map[String, String] = Map.empty,
      sysProps: Seq[String] = Seq.empty,
      maxHeap: String = "3g"): Process = {
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
    val drain = new Thread(() =>
      try proc.getInputStream.transferTo(
        java.io.OutputStream.nullOutputStream())
      catch { case _: Throwable => })
    drain.setDaemon(true)
    drain.start()
    proc
  }
}
