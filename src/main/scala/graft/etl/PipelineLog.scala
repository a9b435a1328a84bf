package graft.etl

import java.nio.file.{Files, Path, StandardOpenOption}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** Reference-parity pipeline logging (wallmart_pipeline.py:6-14): the
  * reference configures a FileHandler ("pipeline.log") plus a
  * StreamHandler with a `%Y-%m-%d %H:%M:%S - LEVEL - message` line
  * format, and every stage logs success or `Error in <stage>(): <msg>`
  * before re-raising. This twin mirrors that observable contract — each
  * line goes to stderr and, when `logFile` is set, appends to that file —
  * without pulling a logging framework into the library surface.
  */
object PipelineLog {

  /** Optional file sink (the reference's `pipeline.log`); None = stderr
    * only. Settable by embedding applications and specs.
    */
  @volatile var logFile: Option[Path] = None

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  private def emit(level: String, msg: String): Unit = synchronized {
    val line = s"${LocalDateTime.now.format(fmt)} - $level - $msg"
    System.err.println(line)
    logFile.foreach { p =>
      Files.write(p, java.util.List.of(line),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  def info(msg: String): Unit = emit("INFO", msg)
  def error(msg: String): Unit = emit("ERROR", msg)
  def critical(msg: String): Unit = emit("CRITICAL", msg)
}
