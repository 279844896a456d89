package graft.fls

/** The corruption error contract: every failure caused by a malformed
  * or truncated .fls file surfaces as an `IOException` whose message
  * starts with `fls:` and names the file — never a bare
  * ArrayIndexOutOfBounds from codec internals, and never silent wrong
  * data for any structurally detectable corruption (bounds, magics,
  * lengths, dictionary code ranges). The reference throws on bad
  * footers at open (/root/reference/src/reader/fls_reader.cpp, footer
  * parse); this extends the same posture to segment bodies. */
object FlsErrors {

  def corrupt(msg: String): Nothing =
    throw new java.io.IOException("fls: " + msg)

  def corrupt(msg: String, cause: Throwable): Nothing =
    throw new java.io.IOException("fls: " + msg, cause)

  /** True when `e` already carries an fls-labeled message — those pass
    * through unchanged so context is attached exactly once. */
  def isLabeled(e: Throwable): Boolean = {
    val m = e.getMessage
    m != null && m.startsWith("fls:")
  }

  @inline private def describe(e: Throwable): String =
    e.getClass.getSimpleName + Option(e.getMessage).map(": " + _).getOrElse("")

  /** Run `body`; any non-fatal, non-fls failure is re-labeled with
    * `ctx` (file / row group / column) as corruption. VM errors
    * (OutOfMemory, …) and interrupts pass through untouched. */
  def wrap[T](ctx: => String)(body: => T): T =
    try body
    catch {
      case e: Throwable
          if !isLabeled(e) && scala.util.control.NonFatal(e) =>
        corrupt(s"$ctx — corrupt file or unreadable data (${describe(e)})", e)
    }
}
