package graft.delivery

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Test webhook endpoint mirroring the reference harness
  * (`tests/utilities.py:60-113`): records every payload, optional response
  * delay (to force timeouts), optional fail-first-N (to force retries). */
class CaptureServer {
  val received = new ConcurrentLinkedQueue[(String, Map[String, String])]()
  @volatile var responseDelayMs: Long = 0
  val failFirst = new AtomicInteger(0)

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/webhook", (ex: HttpExchange) => {
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val headers = {
      val it = ex.getRequestHeaders.entrySet().iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.get(0) }
      b.result()
    }
    if (responseDelayMs > 0) Thread.sleep(responseDelayMs)
    val status = if (failFirst.getAndUpdate(n => math.max(0, n - 1)) > 0) 500 else 200
    received.add((body, headers))
    val resp = """{"status":"success"}""".getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, resp.length)
    ex.getResponseBody.write(resp)
    ex.close()
  })
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
  server.start()

  def port: Int = server.getAddress.getPort
  def url: String = s"http://127.0.0.1:$port/webhook"
  def bodies: Seq[String] = { val it = received.iterator(); val b = Seq.newBuilder[String]
    while (it.hasNext) b += it.next()._1; b.result() }
  def stop(): Unit = server.stop(0)
}
