package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Envelope encryption: data keys wrapped by the master, rotation
  * without re-encrypting data, mixed-envelope single-pass decrypt. */
class EnvelopeCryptoSpec extends SparkSuite {
  import spark.implicits._

  private val master = AesCodec.fromEnv()

  private def batch(rows: (String, String)*) =
    rows.toSeq.toDF("mrn", "name")

  test("batch roundtrip: values restored, envelope columns constant") {
    val enc = EnvelopeCrypto.encryptBatch(
      batch(("M1", "Jane"), ("M2", "John")), Seq("name"), master)
    assert(enc.select(countDistinct("key_id"), countDistinct("wrapped_dek"))
      .head == org.apache.spark.sql.Row(1L, 1L))
    assert(enc.filter(col("name").isin("Jane", "John")).count() == 0)
    val dec = EnvelopeCrypto.decryptBatch(enc, Seq("name"), master)
    assert(dec.select("mrn", "name").collect().map(r => (r.getString(0),
      r.getString(1))).toSet == Set(("M1", "Jane"), ("M2", "John")))
  }

  test("master rotation re-wraps the key; ciphertext bytes untouched") {
    // materialize: encryptCol is nondeterministic (fresh IV per plan
    // execution), so pin the ciphertext bytes before comparing actions
    val live = EnvelopeCrypto.encryptBatch(batch(("M1", "Jane")), Seq("name"), master)
    val enc = spark.createDataFrame(
      spark.sparkContext.parallelize(live.collect().toSeq), live.schema)
    val row = enc.select("name", "key_id", "wrapped_dek").head
    val (ct, keyId, wrapped) = (row.getString(0), row.getString(1), row.getString(2))

    val newMaster = AesCodec.fromEnv() // fresh random key
    val rotated = EnvelopeCrypto.rewrap(master, newMaster,
      EnvelopeCrypto.Envelope(keyId, wrapped))
    assert(rotated.wrappedKey != wrapped)

    // swap ONLY the wrapped key column — data column is byte-identical
    val reKeyed = enc.withColumn("wrapped_dek", lit(rotated.wrappedKey))
    assert(reKeyed.select("name").head.getString(0) == ct)
    val dec = EnvelopeCrypto.decryptBatch(reKeyed, Seq("name"), newMaster)
    assert(dec.select("name").head.getString(0) == "Jane")
  }

  test("mixed envelopes decrypt in one pass") {
    val a = EnvelopeCrypto.encryptBatch(batch(("M1", "Jane")), Seq("name"), master)
    val b = EnvelopeCrypto.encryptBatch(batch(("M2", "John")), Seq("name"), master)
    assert(a.select("wrapped_dek").head != b.select("wrapped_dek").head)
    val dec = EnvelopeCrypto.decryptBatch(a.unionByName(b), Seq("name"), master)
    assert(dec.select("name").collect().map(_.getString(0)).toSet ==
      Set("Jane", "John"))
  }

  test("a foreign master cannot open the envelope") {
    val enc = EnvelopeCrypto.encryptBatch(batch(("M1", "Jane")), Seq("name"), master)
    val foreign = AesCodec.fromEnv()
    intercept[Exception] {
      EnvelopeCrypto.decryptBatch(enc, Seq("name"), foreign)
        .select("name").head
    }
  }
}
