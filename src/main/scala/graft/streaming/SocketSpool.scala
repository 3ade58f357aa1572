package graft.streaming

import java.io.{BufferedReader, IOException, InputStreamReader}
import java.net.{Socket, SocketTimeoutException}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Durable spool bridging a NON-replayable transport (a TCP socket —
  * or any connector that can't re-serve a byte range on demand) into
  * the replayable file stream that gives Structured Streaming its
  * exactly-once guarantee.
  *
  * A raw socket cannot checkpoint-resume: its offsets are per-
  * connection line counters, so a restarted query finds the committed
  * offset ahead of a fresh connection and aborts ("Offsets committed
  * out of order"). The standard production fix is persist-then-process
  * — land frames on durable storage first, then stream the files
  * (the Kinesis Firehose → object store → tail pattern; the
  * reference's `consumer.py` gets the same property from Kinesis'
  * replayable shard iterators). This class is that landing step as a
  * library component:
  *
  *  - a daemon thread connects to `host:port` and reads JSON lines;
  *  - lines roll into `dir` as atomically-renamed `part-*.jsonl`
  *    files (never a partially-visible file), on idle or every
  *    `maxLinesPerFile`;
  *  - the connection is retried forever, so producer restarts and
  *    crashes on the QUERY side don't lose the transport.
  *
  * Downstream, `EventStreams.readEventStream(spark,
  * EventSource.JsonlDir(dir))` (graft's own DSv2 micro-batch source —
  * durable (file, byte-range) offsets, resumable mid-file, byte-capped
  * triggers) or `EventSource.FileTail(dir, "json")` is the replayable
  * source: with a checkpoint, lines are processed exactly once across
  * crash/resume, and recovered dedup state drops at-least-once
  * redeliveries from the producer. StreamingSpec drives the full loop
  * live on both paths.
  */
final class SocketSpool(host: String, port: Int, dir: String,
                        idleMillis: Int = 100,
                        maxLinesPerFile: Int = 1000) extends AutoCloseable {
  require(idleMillis > 0 && maxLinesPerFile > 0)
  Files.createDirectories(Paths.get(dir))
  // recover from a predecessor killed mid-roll: orphaned `.part-*.tmp`
  // files are invisible to Spark (dot prefix) but would accumulate.
  // Assumes one (recovering) writer per spool dir — the same contract
  // the sessionId file naming already relies on.
  locally {
    val listing = Files.list(Paths.get(dir))
    try listing.iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith(".part-") && n.endsWith(".tmp")
      }
      .toList.foreach(p => try Files.deleteIfExists(p) catch { case _: IOException => () })
    finally listing.close()
  }

  @volatile private var running = true
  private val seq = new AtomicLong(0)
  private val sessionId = java.lang.Long.toHexString(System.nanoTime())

  private val thread = new Thread(() => pump(), s"socket-spool-$host-$port")
  thread.setDaemon(true)
  thread.start()

  private def pump(): Unit = {
    while (running) {
      var sock: Socket = null
      // buffer scoped to the CONNECTION, flushed in the finally: a
      // transport error mid-read (connection reset, not clean EOF)
      // must still land the lines already consumed from the socket —
      // dropping them would break the durable-landing contract
      val buf = new ArrayBuffer[String]
      try {
        sock = new Socket(host, port)
        sock.setSoTimeout(idleMillis)
        val in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
        var open = true
        while (open && running) {
          val got = try {
            val line = in.readLine()
            if (line == null) open = false
            Option(line)
          } catch { case _: SocketTimeoutException => None } // idle
          got.foreach(buf += _)
          // roll on idle (latency floor = idleMillis) or at the size cap
          if (buf.nonEmpty && (got.isEmpty || buf.length >= maxLinesPerFile))
            rollNow(buf)
        }
      } catch {
        case _: IOException => // reconnect after a beat (buf flushed below)
          if (running) try Thread.sleep(200) catch { case _: InterruptedException => () }
        case _: InterruptedException => () // close() → exit via the running flag
      } finally {
        if (buf.nonEmpty) try rollNow(buf) catch { case _: IOException => () }
        if (sock != null) try sock.close() catch { case _: IOException => () }
      }
    }
  }

  /** Write-then-atomic-rename so the file source never lists a partial
    * file; the dot-prefixed temp name is invisible to Spark's file
    * listing by convention. */
  private def rollNow(buf: ArrayBuffer[String]): Unit = {
    val n = seq.getAndIncrement()
    val tmp = Paths.get(dir, s".part-$sessionId-$n.tmp")
    val dst = Paths.get(dir, s"part-$sessionId-$n.jsonl")
    Files.write(tmp, buf.asJava, UTF_8)
    Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
    buf.clear()
  }

  /** Graceful stop: clear the flag and let the pump exit through its
    * soTimeout poll (≤ idleMillis), so an in-flight rollNow completes —
    * an interrupt landing inside NIO Files.write would abort the roll
    * with ClosedByInterruptException, losing the final buffer and
    * leaving a stray .tmp. Interrupt only as a last resort (e.g. the
    * pump is stuck in a blocking connect). */
  def close(): Unit = {
    running = false
    thread.join(2000)
    if (thread.isAlive) { thread.interrupt(); thread.join(2000) }
  }
}
