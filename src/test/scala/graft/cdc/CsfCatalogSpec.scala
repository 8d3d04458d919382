package graft.cdc

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** A7 CSF fuse + A13/A16 catalog ladder and cast projection. */
class CsfCatalogSpec extends AnyFunSuite {

  test("CSF fragments fuse into one statement in seq order (Task:277-281)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val base = RedoEvent.simple(5, "x1", RedoEvent.Insert, rowId = "RA")
    val frags = Seq(
      base.copy(sqlRedo = "insert into T(ID) va", csf = true, seq = 1),
      base.copy(sqlRedo = "lues (", csf = true, seq = 2),
      base.copy(sqlRedo = "42)", csf = false, seq = 3),
      RedoEvent.simple(6, "x1", RedoEvent.Insert, sqlRedo = "whole", rowId = "RB").copy(seq = 4))
    val out = Csf.fuse(frags.toDS()).collect().sortBy(_.scn)
    assert(out.length == 2)
    assert(out.head.sqlRedo == "insert into T(ID) values (42)" && !out.head.csf)
    assert(out.last.sqlRedo == "whole")
  }

  test("independent DMLs sharing (xid, scn, rowId) are NOT concatenated (csf run-splitting)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    // Oracle assigns one SCN to many changes: insert-then-update on the same row at the
    // same SCN in one txn must survive as TWO statements (each run ends at its csf=false)
    val base = RedoEvent.simple(5, "x1", RedoEvent.Insert, rowId = "RA")
    val evs = Seq(
      base.copy(sqlRedo = "insert into T(ID) values (1)", csf = false, seq = 1),
      base.copy(operation = RedoEvent.Update,
        sqlRedo = "update T set ID = 2 where ID = 1", csf = false, seq = 2))
    val out = Csf.fuse(evs.toDS()).collect().sortBy(_.seq)
    assert(out.length == 2)
    assert(out.head.sqlRedo == "insert into T(ID) values (1)")
    assert(out.last.sqlRedo == "update T set ID = 2 where ID = 1")
  }

  test("fragmented run followed by an independent DML in one group fuses only the run") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val base = RedoEvent.simple(5, "x1", RedoEvent.Insert, rowId = "RA")
    val evs = Seq(
      base.copy(sqlRedo = "insert into T(ID) va", csf = true, seq = 1),
      base.copy(sqlRedo = "lues (42)", csf = false, seq = 2),
      base.copy(operation = RedoEvent.Delete,
        sqlRedo = "delete from T where ID = 42", csf = false, seq = 3))
    val out = Csf.fuse(evs.toDS()).collect().sortBy(_.seq)
    assert(out.map(_.sqlRedo).toList ==
      List("insert into T(ID) values (42)", "delete from T where ID = 42"))
  }

  test("truncated trailing run is flushed with csf=true (observable, not dropped)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val base = RedoEvent.simple(5, "x1", RedoEvent.Insert, rowId = "RA")
    val evs = Seq(
      base.copy(sqlRedo = "insert into T(ID) va", csf = true, seq = 1),
      base.copy(sqlRedo = "lues (4", csf = true, seq = 2)) // terminator never arrives
    val out = Csf.fuse(evs.toDS()).collect()
    assert(out.length == 1)
    assert(out.head.sqlRedo == "insert into T(ID) values (4")
    assert(out.head.csf) // still marked incomplete
  }

  test("property: fuseAdjacent is split-invariant — any micro-batch cut fuses identically (300 seeds)") {
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      var seq = 0L
      // statements over few (scn, rowId) keys so adjacent same-key runs occur; fragments
      // of one statement are contiguous (the LogMiner cursor contract)
      val stmts = (1 to 1 + rnd.nextInt(6)).map { i =>
        val scn = rnd.nextInt(3).toLong
        val rowId = s"R${rnd.nextInt(3)}"
        val text = s"stmt$i:" + ("abcdefgh" * (1 + rnd.nextInt(3)))
        val nFrags = 1 + rnd.nextInt(4)
        val cuts = (0 +: Seq.fill(nFrags - 1)(1 + rnd.nextInt(text.length - 1)).sorted :+ text.length)
        val parts = cuts.sliding(2).map { case Seq(a, b) => text.substring(a, b) }.toVector
        val events = parts.zipWithIndex.map { case (p, j) =>
          seq += 1
          RedoEvent.simple(scn, "x", RedoEvent.Insert, sqlRedo = p, rowId = rowId)
            .copy(csf = j < parts.length - 1, seq = seq)
        }
        (text, events)
      }
      val events = stmts.flatMap(_._2)
      val expected = stmts.map(_._1).toList
      // unsplit fusion recovers every statement byte-exactly, in order
      val (out, open) = Csf.fuseAdjacent(events.iterator)
      assert(open.isEmpty && out.map(_.sqlRedo).toList == expected)
      // ANY batch cut + state carry produces the same result (the streaming invariant)
      val cut = rnd.nextInt(events.length + 1)
      val (a, b) = events.splitAt(cut)
      val (out1, carry) = Csf.fuseAdjacent(a.iterator)
      val (out2, open2) = Csf.fuseAdjacent(b.iterator, carry)
      assert(open2.isEmpty && (out1 ++ out2).map(_.sqlRedo).toList == expected)
    }
  }

  test("NUMBER precision ladder matches Utils:191-241") {
    import Catalog.oracleTypeToSpark
    assert(oracleTypeToSpark("NUMBER", 0, 2) == DoubleType)   // scale>0 -> double
    assert(oracleTypeToSpark("NUMBER", 5, 3) == DoubleType)
    assert(oracleTypeToSpark("NUMBER", 2, 0) == ByteType)
    assert(oracleTypeToSpark("NUMBER", 4, 0) == ShortType)
    assert(oracleTypeToSpark("NUMBER", 9, 0) == IntegerType)
    assert(oracleTypeToSpark("NUMBER", 10, 0) == LongType)
    // unconstrained NUMBER (precision 0, scale 0) can hold fractions: FLOAT64 (Utils:194)
    assert(oracleTypeToSpark("NUMBER", 0, 0) == DoubleType)
    assert(oracleTypeToSpark("VARCHAR2", 0, 0) == StringType)
    assert(oracleTypeToSpark("NCLOB???unknown", 0, 0) == StringType)
    assert(oracleTypeToSpark("DATE", 0, 0) == TimestampType)
    assert(oracleTypeToSpark("TIMESTAMP(6) WITH TIME ZONE", 0, 0) == TimestampType)
  }

  test("castProjection types payload entries and truncates timestamp tz suffix (Utils:436-465)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("ts", TimestampType), StructField("missing", IntegerType)))
    val df = Seq(Map("ID" -> "42", "NAME" -> "x", "TS" -> "2020-01-02 03:04:05+05:00"))
      .toDF("payload")
      .select(Catalog.castProjection(col("payload"), schema): _*)
    val row = df.collect().head
    assert(row.getLong(0) == 42L && row.getString(1) == "x")
    assert(row.getTimestamp(2).toString.startsWith("2020-01-02 03:04:05"))
    assert(row.isNullAt(3)) // column absent from payload -> typed null
  }

  test("catalog carries pk/uq flags as StructField.metadata (SQL:13 dcc/duq, §1.2)") {
    val spark = graft.SparkTestSession.spark
    val schema = Catalog.schemaOf(spark, "/root/testdata/sf0.001", "lineitem")
    assert(Catalog.keyColumns(schema, "pk").toSet == Set("l_orderkey", "l_linenumber"))
    assert(schema("l_orderkey").metadata.getBoolean("pk"))
    assert(!schema("l_quantity").metadata.contains("pk"))
    // direct metadata builder: uq flag + existing metadata preserved
    val withUq = Catalog.withKeyMetadata(schema, Set("l_orderkey"), Set("l_comment_x", "l_quantity"))
    assert(Catalog.keyColumns(withUq, "uq") == Seq("l_quantity"))
  }

  test("dictionary keys are per (owner, table): same-named tables do not merge pk sets") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    // pkUqDictionary output shape; HR.EMP keys on ID, SALES.EMP keys on (REGION, ID) — a
    // table_name-only lookup would union them into a wrong 3-column composite key
    val dict = Seq(
      ("HR", "EMP", "ID", 1L, 1, 0), ("HR", "EMP", "NAME", 2L, 0, 0),
      ("SALES", "EMP", "REGION", 1L, 1, 0), ("SALES", "EMP", "ID", 2L, 1, 0),
      ("SALES", "EMP", "NAME", 3L, 0, 1))
      .toDF("owner", "table_name", "column_name", "column_id", "pk_column", "uq_column")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("region", StringType), StructField("name", StringType)))
    val hr = Catalog.withKeyMetadataFromDictionary(schema, dict, "HR", "EMP")
    assert(Catalog.effectiveKeys(hr) == Seq("id"))
    val sales = Catalog.withKeyMetadataFromDictionary(schema, dict, "SALES", "emp")
    assert(Catalog.effectiveKeys(sales).toSet == Set("id", "region"))
    assert(Catalog.keyColumns(sales, "uq") == Seq("name"))
    // and the faithful dictionary query itself keeps owner in its projection
    val tabCols = Seq(("HR", "EMP", "ID", 1L, "NO", "NO"))
      .toDF("owner", "table_name", "column_name", "column_id", "hidden_column", "virtual_column")
    val cons = Seq(("HR", "PK_E", "EMP", "P")).toDF("owner", "constraint_name", "table_name", "constraint_type")
    val consCols = Seq(("HR", "PK_E", "EMP", "ID")).toDF("owner", "constraint_name", "table_name", "column_name")
    val indCols = Seq.empty[(String, String, String, String)]
      .toDF("table_owner", "index_name", "table_name", "column_name")
    val indexes = Seq.empty[(String, String, String)].toDF("owner", "index_name", "uniqueness")
    val out = Catalog.pkUqDictionary(tabCols, cons, consCols, indCols, indexes)
    assert(out.columns.toList ==
      List("owner", "table_name", "column_name", "column_id", "pk_column", "uq_column"))
    assert(out.collect().map(r => (r.getString(0), r.getInt(4))).toList == List(("HR", 1)))
  }

  test("multimodal resize: BMP encode/decode round-trip with real row padding") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    // 100 bytes → 8×12 grid, 4 tail bytes truncated; w*3=24 is 4-aligned so stride=24
    val media = Seq(graft.ext.Multimodal.MediaRow(1L, (0 until 100).map(_.toByte).toArray)).toDS()
    val bmp = graft.ext.Multimodal.encodeBmp(media, width = 8).collect().head.payload
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte && bmp.length == 54 + 24 * 12)
    val r = graft.ext.Multimodal
      .resizeBmp(graft.ext.Multimodal.encodeBmp(media, width = 8), 4, 3).collect().head
    assert(r.src_w == 8 && r.src_h == 12 && r.width == 4 && r.height == 3)
    // nearest-neighbor: out(i,j) = byte((j*12/3)*8 + 2i) for i<4, j<3
    val expected = (for (j <- 0 until 3; i <- 0 until 4) yield (j * 12 / 3) * 8 + 2 * i).map(_.toLong).sum
    assert(r.pix_sum == expected)
    // empty payload: 8×1 black image
    val empty = Seq(graft.ext.Multimodal.MediaRow(2L, Array.emptyByteArray)).toDS()
    val re = graft.ext.Multimodal
      .resizeBmp(graft.ext.Multimodal.encodeBmp(empty, width = 8), 4, 3).collect().head
    assert(re.src_h == 1 && re.pix_sum == 0L)
  }

  test("multimodal frame-sample: AVI container codec round-trip") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val media = Seq(
      graft.ext.Multimodal.MediaRow(1L, (0 until 100).map(_.toByte).toArray),
      graft.ext.Multimodal.MediaRow(2L, (0 until 33).map(_.toByte).toArray), // odd chunk len: pad path
      graft.ext.Multimodal.MediaRow(3L, Array.emptyByteArray))               // empty frames
      .toDS()
    val avi = graft.ext.Multimodal.encodeAvi(media, nFrames = 10).collect().sortBy(_.doc_id)
    val h = avi.head.payload
    assert(new String(h.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(h.slice(8, 12), "US-ASCII") == "AVI ")
    val frames = graft.ext.Multimodal
      .sampleFrames(graft.ext.Multimodal.encodeAvi(media, nFrames = 10), stride = 3)
      .collect().groupBy(_.doc_id)
    assert(frames(1L).map(_.frame_idx).sorted.toList == List(0, 3, 6, 9))
    assert(frames(1L).forall(_.payload.length == 10))
    // 33 bytes / 10 frames → chunk 3 (odd: every 00db body pads to even); frame 3 = [9,12)
    assert(frames(2L).sortBy(_.frame_idx).map(_.payload.length).toList == List(3, 3, 3, 3))
    assert(frames(2L).find(_.frame_idx == 3).get.payload.toList ==
      List(9, 10, 11).map(_.toByte))
    assert(frames(3L).forall(_.payload.isEmpty))
    // tampered container: header frame count vs movi content cross-check must throw
    val bad = avi.head.payload.clone()
    // dwTotalFrames lives at RIFF(12) + LIST hdrl hdr(12) + 'avih'+size(8) + 4 ints(16) = 48
    bad(48) = 99.toByte
    val ex = intercept[org.apache.spark.SparkException] {
      graft.ext.Multimodal.sampleFrames(
        Seq(graft.ext.Multimodal.MediaRow(9L, bad)).toDS(), stride = 3).collect()
    }
    assert(ex.getMessage.contains("declares") || ex.getCause != null)
  }

  test("multimodal decode: WAV codec round-trip through the partition-parallel surface") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val media = Seq(
      graft.ext.Multimodal.MediaRow(1L, "abcde".getBytes("UTF-8")), // odd length: pad path
      graft.ext.Multimodal.MediaRow(2L, Array.emptyByteArray)).toDS()
    val out = graft.ext.Multimodal
      .decodeWav(graft.ext.Multimodal.encodeWav(media, id => 8000 + id.toInt * 100))
      .collect().sortBy(_.doc_id)
    assert(out.map(_.n_samples).toList == List(5, 0))
    assert(out.map(_.sample_rate).toList == List(8100, 8200))
    assert(out.forall(w => w.audio_format == 1 && w.n_channels == 1 && w.bits_per_sample == 8))
    assert(out.head.sample_sum == "abcde".getBytes("UTF-8").map(_ & 0xff).sum.toLong)
    assert(out.head.f0 == 'a'.toInt.toDouble) // only index 0 is ≡ 0 mod 8 in 5 samples
  }

  test("decodeWav is a real chunk walker: unknown chunks, odd padding, order-independence") {
    import java.nio.{ByteBuffer, ByteOrder}
    val data = Array[Byte](10, 20, 30) // odd data chunk: decoder must step over the pad
    val junk = Array[Byte](1, 2, 3, 4, 5) // odd unknown chunk BEFORE fmt, also padded
    val body = 8 + junk.length + 1 + 8 + 16 + 8 + data.length + 1
    val buf = ByteBuffer.allocate(8 + 4 + body).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(4 + body).put("WAVE".getBytes)
    buf.put("LIST".getBytes).putInt(junk.length).put(junk).put(0.toByte)
    buf.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(22050).putInt(22050).putShort(1).putShort(8)
    buf.put("data".getBytes).putInt(data.length).put(data).put(0.toByte)
    val w = graft.ext.Multimodal.decodeWavOne(7L, buf.array())
    assert(w.sample_rate == 22050 && w.n_samples == 3 && w.sample_sum == 60L)
    // corrupted magic must fail loudly, not mis-parse
    val bad = buf.array().clone(); bad(0) = 'X'.toByte
    val e = intercept[IllegalArgumentException](graft.ext.Multimodal.decodeWavOne(8L, bad))
    assert(e.getMessage.contains("RIFF"))
  }

  test("AVI walk rejects out-of-bounds chunk sizes loudly (no infinite loop, no huge alloc)") {
    import java.nio.{ByteBuffer, ByteOrder}
    // minimal RIFF/AVI envelope with one chunk whose size field is NEGATIVE — without the
    // bounds require the walk would loop forever on it (next == chunk start)
    def container(chunkSize: Int): Array[Byte] = {
      val body = 4 + 8 // "AVI " + one chunk header
      val buf = ByteBuffer.allocate(8 + body).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes).putInt(body).put("AVI ".getBytes)
      buf.put("junk".getBytes).putInt(chunkSize)
      buf.array()
    }
    val e1 = intercept[IllegalArgumentException](
      graft.ext.Multimodal.sampleFramesOne(1L, container(-8), 1).toList)
    assert(e1.getMessage.contains("out of bounds"))
    val e2 = intercept[IllegalArgumentException](
      graft.ext.Multimodal.sampleFramesOne(2L, container(0x7FFFFFF0), 1).toList)
    assert(e2.getMessage.contains("out of bounds"))
  }

  test("A14: dictionary-backed schema cache loads on miss only; invalidate forces reload") {
    val src = "csfcatalogspec-a14"
    Catalog.invalidate(src, "T")
    var loads = 0
    def load(cols: Seq[(String, String, Int, Int)]): StructType = {
      loads += 1; Catalog.schemaFromTabCols(cols)
    }
    val v1 = Seq(("ID", "NUMBER", 9, 0), ("NAME", "VARCHAR2", 0, 0))
    val s1 = Catalog.schemaOfDictionary(src, "T")(load(v1))
    assert(s1.fieldNames.toList == List("id", "name") && loads == 1)
    // hit: `load` is by-name, so on a cache hit a throwing loader must never evaluate
    val s1b = Catalog.schemaOfDictionary(src, "T")(sys.error("loader ran on a cache hit"))
    assert(s1b == s1)
    // DDL: evict, reload sees the new column through the NUMBER ladder (precision 4 -> short)
    Catalog.invalidate(src, "T")
    val v2 = v1 :+ (("TIER", "NUMBER", 4, 0))
    val s2 = Catalog.schemaOfDictionary(src, "T")(load(v2))
    assert(loads == 2)
    assert(s2.fields.map(f => (f.name, f.dataType)).toList ==
      List(("id", IntegerType), ("name", StringType), ("tier", ShortType)))
    Catalog.invalidate(src, "T")
  }
}
