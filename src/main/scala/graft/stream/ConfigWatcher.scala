package graft.stream

import java.nio.file.{ClosedWatchServiceException, Files, Path, StandardWatchEventKinds}

import scala.jdk.CollectionConverters._

/** P15 config hot-reload, file-watch form: the reference watched its
  * omegaconf files with watchdog and re-applied settings live
  * (`reference/CHANGELOG.md:116,173`). This twin watches one
  * properties-style file (`key=value` lines, `#` comments) with the JDK
  * WatchService (inotify on Linux) and swaps the parsed snapshot
  * atomically on modify/create events.
  *
  * Wiring into a stream is unchanged from the per-batch form:
  * `StreamOps.scoreWithReloadedConfig(ds, () => watcher.getDouble(...))` —
  * foreachBatch re-reads the snapshot at each micro-batch boundary, so an
  * edit takes effect on the next batch without restarting the query, and
  * the watcher makes the re-read an in-memory map hit instead of file
  * I/O per batch.
  */
final class ConfigWatcher(path: Path) extends AutoCloseable {

  private def load(): Map[String, String] =
    if (!Files.exists(path)) Map.empty
    else Files.readAllLines(path).asScala
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
      .map { l =>
        val i = l.indexOf('=')
        l.substring(0, i).trim -> l.substring(i + 1).trim
      }.toMap

  @volatile private var current: Map[String, String] = load()

  private val watch = path.getParent.getFileSystem.newWatchService()
  path.getParent.register(watch,
    StandardWatchEventKinds.ENTRY_MODIFY, StandardWatchEventKinds.ENTRY_CREATE)

  private val watcher = new Thread(() => {
    try {
      var live = true
      while (live) {
        val key = watch.take()
        val touched = key.pollEvents().asScala.exists { e =>
          e.context() match {
            case p: Path => p.getFileName == path.getFileName
            case _ => false
          }
        }
        if (touched) current = load()
        live = key.reset()
      }
    } catch {
      case _: ClosedWatchServiceException | _: InterruptedException => ()
    }
  }, s"graft-config-watch-${path.getFileName}")
  watcher.setDaemon(true)
  watcher.start()

  def snapshot: Map[String, String] = current

  def get(key: String): Option[String] = current.get(key)

  def getDouble(key: String, default: Double): Double =
    current.get(key).flatMap(_.toDoubleOption).getOrElse(default)

  /** Test helper: watch delivery is async — poll until the key satisfies
    * `pred` or the timeout passes; returns whether it did. */
  def awaitValue(key: String, timeoutMs: Long = 10000L)
                (pred: Option[String] => Boolean): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var ok = pred(get(key))
    while (!ok && System.nanoTime() < deadline) {
      Thread.sleep(25L)
      ok = pred(get(key))
    }
    ok
  }

  override def close(): Unit = {
    watch.close()
    watcher.interrupt()
  }
}
