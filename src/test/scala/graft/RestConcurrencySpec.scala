package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

import graft.api.RestService
import graft.sources.Tables
import graft.tables.TableStore
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** r17 read-concurrency contract of the serving tier: handlers run on
  * a small pool, so READS proceed while a WRITE holds the writer
  * lock, and writes still serialize with each other through that
  * lock. Deterministic (no timing): the first write parks on a latch
  * INSIDE the lock via an instrumented idGen (postReserva draws its
  * id under the lock), which pins the lock held-open while the spec
  * probes the other properties.
  */
class RestConcurrencySpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSpark.spark

  private var svc: RestService = _
  private val gate = new CountDownLatch(1)   // parks write #1
  private val entered = new CountDownLatch(1) // write #1 is inside the lock
  private val ids = new AtomicLong(0)

  override def beforeAll(): Unit = {
    val root = Files.createTempDirectory("graft-conc").toString
    val store = new TableStore(spark, root)
    store.init("eventos", Tables.eventos(spark))
    store.init("inventario", Tables.inventario(spark))
    store.init("reservas", Tables.reservas(spark))
    svc = new RestService(spark, store, idGen = () => {
      val i = ids.incrementAndGet()
      if (i == 1) { // first reservation id draw: hold the writer lock
        entered.countDown()
        gate.await(60, TimeUnit.SECONDS)
      }
      f"$i%024x"
    })
    svc.start()
  }

  override def afterAll(): Unit = {
    gate.countDown() // never leave the parked write holding the lock
    if (svc != null) svc.stop()
  }

  private def http(method: String, path: String, body: String = null)
      : (Int, String) = {
    val conn = new URI(s"http://127.0.0.1:${svc.boundPort}$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    conn.setConnectTimeout(30000)
    conn.setReadTimeout(60000)
    if (body != null) {
      conn.setDoOutput(true)
      conn.getOutputStream.write(body.getBytes(UTF_8))
    }
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val text = if (is == null) "" else
      new String(is.readAllBytes(), UTF_8)
    (code, text)
  }

  test("reads proceed while a write holds the writer lock; writes serialize") {
    // write #1: parks inside lock.synchronized on the idGen latch
    val w1 = new Thread(() => {
      http("POST", "/reservas",
        """{"Evento":"NoSuchEvent","Email":"a@b.c","Cantidad":1}""")
      ()
    }, "spec-write-1")
    w1.start()
    assert(entered.await(60, TimeUnit.SECONDS),
      "write #1 never reached the writer lock")

    // READS while the lock is held: under the old single-threaded
    // executor these would queue behind w1 forever (= spec timeout);
    // on the pool they complete. Several in a row proves reads don't
    // serialize behind one another on a single spare thread either.
    (1 to 3).foreach { _ =>
      val (code, _) = http("GET", "/eventos")
      assert(code === 200)
    }

    // write #2 must WAIT for the lock: it reaches the server (one
    // pool thread parked, reads still flowing) but cannot draw an id
    // until w1 releases. idGen call count is the observable: it
    // stays at 1 while w1 is parked.
    val w2done = new CountDownLatch(1)
    val w2 = new Thread(() => {
      http("POST", "/reservas",
        """{"Evento":"AlsoMissing","Email":"x@y.z","Cantidad":1}""")
      w2done.countDown()
    }, "spec-write-2")
    w2.start()
    // give w2 time to be IN the handler; a parked-lock overtake would
    // bump the id counter past 1
    Thread.sleep(300)
    assert(ids.get() === 1L,
      "write #2 drew an id while write #1 still held the writer lock")
    assert(w2done.getCount === 1L)

    gate.countDown()
    w1.join(60000)
    assert(w2done.await(60, TimeUnit.SECONDS),
      "write #2 never completed after the lock was released")
    assert(ids.get() === 2L)
  }
}
