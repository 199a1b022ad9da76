package graft

/** Shared forking machinery of the cross-process specs
  * ([[MultiJvmStressSpec]], [[KillSignalSpec]]): real `java` processes
  * running [[graft.tools.MultiJvmStressWorker]] — own JVMs, own
  * SparkSessions, own claim-backend instances, nothing shared but the
  * storage.
  */
object MultiJvmHarness {

  /** The forked workers must open the same JDK modules as this (Spark-
    * capable) test JVM. Inherit the flags from the RUNNING JVM so the
    * list cannot drift from build.sbt's; fall back to the known Spark 4 /
    * JDK 17 set only if the runtime reports none (non-forked runner).
    */
  val addOpens: Seq[String] = {
    import scala.jdk.CollectionConverters._
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
    val paired = jvmArgs.sliding(2).collect {
      case Seq("--add-opens", v) => Seq("--add-opens", v) }.flatten.toSeq
    val fused = jvmArgs.filter(_.startsWith("--add-opens="))
      .flatMap(a => Seq("--add-opens", a.stripPrefix("--add-opens=")))
    val inherited = paired ++ fused
    if (inherited.nonEmpty) inherited
    else Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
  }

  final case class Worker(tag: String, proc: Process, log: java.io.File)

  /** Fork one worker process. `claimStore` routes its claims through an
    * external conditional-put backend rooted there (None = in-tree FS
    * claims, the default backend).
    */
  def fork(family: String, role: String, state: String, sfDir: String,
      mod: Int, residue: Int, key: String,
      claimStore: Option[String] = None,
      publish: String = "rename"): Worker = {
    val cmd = Seq(s"${System.getProperty("java.home")}/bin/java") ++ addOpens ++
      Seq("-Xmx3g", "-Dspark.ui.enabled=false",
        "-cp", System.getProperty("java.class.path"),
        "graft.tools.MultiJvmStressWorker",
        family, role, state, sfDir, mod.toString, residue.toString, key,
        claimStore.getOrElse("-"), publish)
    // log to a file, not a pipe: four concurrent Spark drivers write more
    // startup chatter than a pipe buffer holds, and a writer blocked on a
    // full pipe would serialize the very race under test
    val log = java.io.File.createTempFile(s"graft_mjvm_${role}_$key", ".log")
    log.deleteOnExit()
    val proc = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true).redirectOutput(log).start()
    Worker(s"$family/$role/$key", proc, log)
  }

  /** Wait for all workers; return (tag, exitCode, output-tail). */
  def drain(ws: Seq[Worker]): Seq[(String, Int, String)] = ws.map { w =>
    val done = w.proc.waitFor(10, java.util.concurrent.TimeUnit.MINUTES)
    assert(done, s"worker ${w.tag} did not finish in 10 minutes")
    val out = new String(java.nio.file.Files.readAllBytes(w.log.toPath), "UTF-8")
    (w.tag, w.proc.exitValue(), out.linesIterator.toSeq.takeRight(12).mkString("\n"))
  }
}
