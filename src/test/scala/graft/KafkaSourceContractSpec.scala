package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Kafka binding run against the generic [[StreamSourceContract]]
  * — compiled WITHOUT the connector on the classpath (this image is
  * zero-egress and `spark-sql-kafka` is not in /opt/spark/jars):
  *
  *  - the reader side is `readStream.format("kafka")` — a string, no
  *    compile-time dependency;
  *  - the producer side goes through reflection over
  *    `org.apache.kafka.clients.producer.KafkaProducer`;
  *  - each contract test `assume`s the connector class and a broker
  *    address (`GRAFT_KAFKA_BOOTSTRAP`), so on this image the suite
  *    compiles and CANCELS (never silently passes).
  *
  * The day `GRAFT_KAFKA_JARS` (see build.sbt) supplies the connector
  * + client jars and `GRAFT_KAFKA_BOOTSTRAP` names a broker, the
  * binding inherits the full contract UNEDITED: capped-drain
  * exactly-once (`maxOffsetsPerTrigger` is the admission-control
  * knob, the Kafka analog of jsonl's `maxBytesPerTrigger` and
  * tablechanges' `maxVersionsPerTrigger`), mid-backlog checkpoint
  * resume, idle-restart determinism — the checklist in
  * [[graft.streaming.EventStreams]] names what a binding inherits
  * from the contract vs must re-prove with binding-specific specs
  * (offset-retention edges, topic deletion). */
class KafkaSourceContractSpec extends AnyFunSuite with StreamSourceContract {
  lazy val spark = TestSpark.spark

  private val bootstrap = sys.env.get("GRAFT_KAFKA_BOOTSTRAP")

  private def connectorPresent: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      Class.forName("org.apache.kafka.clients.producer.KafkaProducer")
      true
    } catch { case _: ClassNotFoundException => false }

  lazy val fixture: SourceContractFixture = new SourceContractFixture {
    val sourceName = "KafkaSource"
    def newEnv(): SourceContractEnv = {
      assume(connectorPresent,
        "spark-sql-kafka + kafka-clients not on the classpath — point " +
          "GRAFT_KAFKA_JARS at the connector jars to run this binding")
      assume(bootstrap.isDefined,
        "no Kafka broker — set GRAFT_KAFKA_BOOTSTRAP=host:port")
      new SourceContractEnv {
        private val topic =
          s"graft-contract-${java.util.UUID.randomUUID().toString.take(8)}"
        private val base = java.nio.file.Files.createTempDirectory("kafka_contract")
        private var n = 0L

        def append(k: Int): Unit = {
          // kafka-clients via reflection so this file compiles on the
          // connector-less image
          val props = new java.util.Properties()
          props.put("bootstrap.servers", bootstrap.get)
          val ser = "org.apache.kafka.common.serialization.StringSerializer"
          props.put("key.serializer", ser)
          props.put("value.serializer", ser)
          val pCls = Class.forName("org.apache.kafka.clients.producer.KafkaProducer")
          val rCls = Class.forName("org.apache.kafka.clients.producer.ProducerRecord")
          val producer = pCls.getConstructor(classOf[java.util.Properties])
            .newInstance(props)
          val rCtor = rCls.getConstructor(classOf[String],
            classOf[Object], classOf[Object])
          val send = pCls.getMethod("send", rCls)
          val close = pCls.getMethod("close")
          try {
            var i = n
            while (i < n + k) {
              val value = s"""{"event_id":$i,"user_id":$i,"event_type":"e","value":1.5}"""
              send.invoke(producer,
                rCtor.newInstance(topic, i.toString, value).asInstanceOf[Object])
              i += 1
            }
          } finally close.invoke(producer)
          n += k
        }

        def appended: Long = n

        def stream(capped: Boolean): DataFrame =
          spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap.get)
            .option("subscribe", topic)
            .option("startingOffsets", "earliest")
            // admission control: bound per-trigger records so the
            // 1000-record backlog needs >3 micro-batches when capped
            .option("maxOffsetsPerTrigger",
              if (capped) "200" else Long.MaxValue.toString)
            .load()
            .select(get_json_object(col("value").cast("string"), "$.event_id")
              .cast("long").as("event_id"))

        val idCol = "event_id"
        val ckptDir: String = base.resolve("ckpt").toString
        val outDir: String = base.resolve("out").toString
      }
    }
  }
}
