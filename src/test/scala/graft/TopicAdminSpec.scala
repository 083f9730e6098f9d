package graft

import graft.sources.{InMemoryTopicAdmin, KafkaTopicAdmin, TopicAdmin}
import org.scalatest.funsuite.AnyFunSuite

/** O5 topic administration (reference pcKafka.go:28-53 CreaTopico +
  * the create-before-subscribe loop at pcKafka.go:60-66). The
  * broker-backed admin is wire-smoked opt-in like KafkaSmokeSpec; the
  * contract itself is pinned against the in-memory implementation. */
class TopicAdminSpec extends AnyFunSuite {

  test("ensureTopic is create-if-absent: first call creates, repeat is a no-op") {
    val admin = new InMemoryTopicAdmin
    assert(admin.ensureTopic("eventos", 1, 1))
    assert(!admin.ensureTopic("eventos", 1, 1)) // boot-time re-create tolerated
    assert(admin.listTopics() === Set("eventos"))
    assert(admin.partitionsOf("eventos") === Some(1))
    // a repeat ensure must NOT clobber the existing topic's layout
    assert(!admin.ensureTopic("eventos", 8, 3))
    assert(admin.partitionsOf("eventos") === Some(1))
  }

  test("create-before-subscribe ensures every topic of a subscription") {
    val admin = new InMemoryTopicAdmin
    admin.ensureTopic("eventos", 1, 1)
    val created = TopicAdmin.ensureTopics(admin,
      Seq("eventos", "reservas", "notificaciones"))
    assert(created === Seq("reservas", "notificaciones"))
    assert(admin.listTopics() ===
      Set("eventos", "reservas", "notificaciones"))
  }

  test("deleteTopic reports existence") {
    val admin = new InMemoryTopicAdmin
    admin.ensureTopic("t", 1, 1)
    assert(admin.deleteTopic("t"))
    assert(!admin.deleteTopic("t"))
    assert(admin.listTopics().isEmpty)
  }

  test("broker round-trip (opt-in via SPARK_GRAFT_KAFKA_URL)") {
    val url = sys.env.get("SPARK_GRAFT_KAFKA_URL")
    assume(url.isDefined,
      "SPARK_GRAFT_KAFKA_URL not set — Kafka admin wire smoke skipped")
    assume(scala.util.Try(Class.forName(
      "org.apache.kafka.clients.admin.AdminClient")).isSuccess,
      "kafka-clients not on the classpath")
    val admin = new KafkaTopicAdmin(url.get)
    try {
      val topic = s"graft_admin_smoke_${System.nanoTime()}"
      assert(admin.ensureTopic(topic, 2, 1))
      assert(!admin.ensureTopic(topic, 2, 1))
      assert(admin.listTopics().contains(topic))
      assert(admin.deleteTopic(topic))
    } finally admin.close()
  }
}
