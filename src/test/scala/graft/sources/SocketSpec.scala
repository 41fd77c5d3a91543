package graft.sources

import graft.SparkSuite
import graft.streaming.StreamOps

import java.io.PrintWriter
import java.net.ServerSocket

/** socketTextStream over loopback (SURVEY §2.1 row: socket source).
  * Reference: SocketTextStreamFunction.java:46 — newline-framed records,
  * trailing \r stripped. No egress is needed: the server lives on
  * 127.0.0.1 inside the test.
  */
class SocketSpec extends SparkSuite {

  test("socketTextStream reads newline-delimited records over loopback") {
    val server = new ServerSocket(0) // ephemeral port
    val lines = Seq("hello world", "crlf framed", "third record")
    @volatile var writer: PrintWriter = null
    val feeder = new Thread(() => {
      try {
        val sock = server.accept()
        writer = new PrintWriter(sock.getOutputStream)
        // one LF-framed, one CRLF-framed (reference strips the \r)
        writer.print(lines(0) + "\n")
        writer.print(lines(1) + "\r\n")
        writer.print(lines(2) + "\n")
        writer.flush()
      } catch { case _: Throwable => () }
    })
    feeder.setDaemon(true)
    feeder.start()

    val df = StreamOps.socketTextStream(spark, "127.0.0.1",
      server.getLocalPort)
    assert(df.isStreaming && df.columns.toSeq == Seq("value"))
    val q = df.writeStream.format("memory").queryName("sock_rows")
      .outputMode("append").start()
    try {
      // the socket source buffers driver-side asynchronously; poll until
      // the three records land (bounded by the deadline, not a sleep)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var got = Seq.empty[String]
      while (got.size < lines.size && System.nanoTime() < deadline) {
        q.processAllAvailable()
        got = spark.table("sock_rows").collect().map(_.getString(0)).toSeq
        if (got.size < lines.size) Thread.sleep(100)
      }
      assert(got.sorted == lines.sorted) // \r stripped, framing intact
    } finally {
      q.stop()
      if (writer != null) writer.close()
      server.close()
      spark.sql("DROP VIEW IF EXISTS sock_rows")
    }
  }
}
