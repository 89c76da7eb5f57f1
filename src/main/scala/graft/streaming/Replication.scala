package graft.streaming

import java.io.{InputStream, OutputStream}
import java.time.{Duration, Instant}
import java.time.format.DateTimeFormatter

/** Replication sequencing (SURVEY.md §2 S3/ST4; reference import_/state.go,
  * update/cmd.go). The network fetch is pluggable (`fetch`) — this container
  * has no egress, so tests exercise the sequencing/state logic and a real
  * deployment plugs an HTTP getter feeding the DiffPipeline's watched dir.
  */
object Replication {

  /** One replication state (the reference's last.state.txt / DiffState). */
  final case class State(sequence: Long, timestamp: Instant, url: String = "")

  /** Parse OSM state.txt: `sequenceNumber=NNN`, `timestamp=...Z` with
    * escaped colons (`\:`). */
  def parseState(in: InputStream): State = {
    val lines = scala.io.Source.fromInputStream(in).getLines().toSeq
    val kv = lines.filterNot(l => l.startsWith("#") || l.isEmpty)
      .flatMap { l =>
        l.split("=", 2) match {
          case Array(k, v) => Some(k.trim -> v.trim.replace("\\:", ":"))
          case _ => None
        }
      }.toMap
    State(
      sequence = kv.getOrElse("sequenceNumber",
        throw new IllegalArgumentException("missing sequenceNumber")).toLong,
      timestamp = kv.get("timestamp").map(Instant.parse).getOrElse(Instant.EPOCH))
  }

  def writeState(s: State, out: OutputStream): Unit = {
    val ts = DateTimeFormatter.ISO_INSTANT.format(s.timestamp).replace(":", "\\:")
    val txt = s"#${Instant.now()}\nsequenceNumber=${s.sequence}\ntimestamp=$ts\n"
    out.write(txt.getBytes("UTF-8"))
  }

  /** Sequence -> path within a replication endpoint: 9 digits split 3/3/3
    * (e.g. 4127372 -> 004/127/372). */
  def sequencePath(seq: Long): String = {
    val s = f"$seq%09d"
    s"${s.substring(0, 3)}/${s.substring(3, 6)}/${s.substring(6, 9)}"
  }

  def diffUrl(base: String, seq: Long): String =
    s"${base.stripSuffix("/")}/${sequencePath(seq)}.osc.gz"

  def stateUrl(base: String, seq: Long): String =
    s"${base.stripSuffix("/")}/${sequencePath(seq)}.state.txt"

  /** Estimate the import start sequence from a PBF timestamp
    * (import_/state.go:39-57, 76-95): current server sequence minus the
    * elapsed intervals since the timestamp, minus a safety `before`. */
  def estimateSequence(current: State, interval: Duration, timestamp: Instant,
      before: Duration = Duration.ZERO): Long = {
    val behind = Duration.between(timestamp, current.timestamp)
    val intervals = math.ceil(
      behind.getSeconds.toDouble / interval.getSeconds.toDouble).toLong
    val buffer = math.ceil(
      before.getSeconds.toDouble / interval.getSeconds.toDouble).toLong
    current.sequence - intervals - buffer
  }

  /** Poll loop skeleton (update/cmd.go:231-257): fetch the next sequence's
    * diff into `downloadDir` until `fetch` fails (not yet available), with
    * the caller handling backoff/retry. Returns the last fetched sequence.
    */
  def fetchAvailable(base: String, from: Long, downloadDir: String,
      fetch: (String, String) => Boolean): Long = {
    var seq = from
    var ok = true
    while (ok) {
      val target = s"$downloadDir/${f"$seq%09d"}.osc.gz"
      ok = fetch(diffUrl(base, seq), target)
      if (ok) seq += 1
    }
    seq - 1
  }
}
