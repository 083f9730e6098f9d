package graft.sources

import scala.jdk.CollectionConverters._

/**
 * O5 — topic administration (reference `pcKafka/pcKafka.go:28-53`
 * `CreaTopico`: dial the controller, create the topic with N
 * partitions / R replicas; `RecibeMensajes` at `pcKafka.go:60-66`
 * creates every subscribed topic before the consumer attaches).
 *
 * The admin surface is a seam, not a query operator: the engine's
 * dataflow never depends on WHO created a topic, only that it exists
 * before subscribe. Keeping it behind a trait gives the flows one
 * `ensureTopics` call that works identically against a real broker
 * (via [[KafkaTopicAdmin]]) and in the offline suite (via
 * [[InMemoryTopicAdmin]]), mirroring how MemoryStream stands in for
 * the Kafka source in FlowsSpec.
 */
trait TopicAdmin {
  /** Create `topic` if absent. Returns true when THIS call created it,
    * false when it already existed — the reference tolerates
    * already-exists on every boot (`CreaTopico` is called
    * unconditionally per subscribed topic). */
  def ensureTopic(topic: String, partitions: Int, replicas: Short): Boolean
  def listTopics(): Set[String]
  /** Returns true when the topic existed and was deleted. */
  def deleteTopic(topic: String): Boolean
}

object TopicAdmin {
  /** Create-before-subscribe (pcKafka.go:60-66): make sure every topic
    * of a subscription exists; returns the subset actually created. */
  def ensureTopics(admin: TopicAdmin, topics: Seq[String],
      partitions: Int = 1, replicas: Short = 1): Seq[String] =
    topics.filter(admin.ensureTopic(_, partitions, replicas))
}

/** Offline stand-in: a concurrent topic registry with the same
  * idempotence contract as the broker-backed admin. */
final class InMemoryTopicAdmin extends TopicAdmin {
  private val topics =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Short)]()
  override def ensureTopic(topic: String, partitions: Int,
      replicas: Short): Boolean =
    topics.putIfAbsent(topic, (partitions, replicas)) == null
  override def listTopics(): Set[String] = topics.keySet.asScala.toSet
  override def deleteTopic(topic: String): Boolean =
    topics.remove(topic) != null
  def partitionsOf(topic: String): Option[Int] =
    Option(topics.get(topic)).map(_._1)
}

/**
 * Broker-backed admin over kafka-clients' `AdminClient`. The class is
 * reached REFLECTIVELY because this offline image ships neither the
 * spark-sql-kafka connector nor kafka-clients (see KafkaIO's header) —
 * on any real Spark distribution the jar is present and this resolves;
 * here construction fails fast with a clear message and the suite's
 * wire smoke cancels (KafkaSmokeSpec pattern).
 */
final class KafkaTopicAdmin(bootstrap: String)
    extends TopicAdmin with AutoCloseable {

  private val admin: AnyRef = {
    val props = new java.util.Properties()
    props.put("bootstrap.servers", bootstrap)
    Class.forName("org.apache.kafka.clients.admin.AdminClient")
      .getMethod("create", classOf[java.util.Properties])
      .invoke(null, props)
  }

  /** Resolve a public method by name+arity on the runtime admin class
    * (covers kafka-clients versions where the surface lives on the
    * `Admin` interface vs the `AdminClient` abstract class). */
  private def method(name: String, arity: Int): java.lang.reflect.Method =
    admin.getClass.getMethods
      .find(m => m.getName == name && m.getParameterCount == arity)
      .getOrElse(throw new NoSuchMethodException(
        s"${admin.getClass.getName}.$name/$arity"))

  /** result.all().get() — unwrap the KafkaFuture of a *Result object;
    * returns the cause class simple name on failure, None on success. */
  private def await(result: AnyRef): Option[String] =
    try {
      val fut = result.getClass.getMethod("all").invoke(result)
      fut.getClass.getMethod("get").invoke(fut)
      None
    } catch {
      case e: java.lang.reflect.InvocationTargetException =>
        val cause = Option(e.getCause).map { c =>
          Option(c.getCause).getOrElse(c) // ExecutionException wrapper
        }
        Some(cause.map(_.getClass.getSimpleName).getOrElse("Unknown"))
    }

  override def ensureTopic(topic: String, partitions: Int,
      replicas: Short): Boolean = {
    val nt = Class.forName("org.apache.kafka.clients.admin.NewTopic")
      .getConstructor(classOf[String], classOf[Int], classOf[Short])
      .newInstance(topic, Int.box(partitions), Short.box(replicas))
      .asInstanceOf[AnyRef]
    await(method("createTopics", 1)
        .invoke(admin, java.util.Collections.singleton(nt))) match {
      case None => true
      case Some("TopicExistsException") => false
      case Some(other) => throw new RuntimeException(
        s"createTopics($topic) failed: $other")
    }
  }

  override def listTopics(): Set[String] = {
    val res = method("listTopics", 0).invoke(admin)
    val fut = res.getClass.getMethod("names").invoke(res)
    fut.getClass.getMethod("get").invoke(fut)
      .asInstanceOf[java.util.Set[String]].asScala.toSet
  }

  override def deleteTopic(topic: String): Boolean =
    await(method("deleteTopics", 1)
        .invoke(admin, java.util.Collections.singleton(topic))) match {
      case None => true
      case Some("UnknownTopicOrPartitionException") => false
      case Some(other) => throw new RuntimeException(
        s"deleteTopics($topic) failed: $other")
    }

  override def close(): Unit =
    admin.getClass.getMethods
      .find(m => m.getName == "close" && m.getParameterCount == 0)
      .foreach(_.invoke(admin))
}
