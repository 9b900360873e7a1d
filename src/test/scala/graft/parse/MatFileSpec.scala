package graft.parse

import org.scalatest.funsuite.AnyFunSuite

/** MAT v5 codec round trips + the reader-only surfaces the writer never
  * emits (small data elements, latin-1 chars, int storage widening). */
class MatFileSpec extends AnyFunSuite {
  import MatFile._

  private val track: Map[String, Value] = Map(
    "ens" -> Num(Seq(1, 1), Array(-1.0)),
    "stormName" -> Str("ALPHA"),
    "annual_id" -> Num(Seq(1, 1), Array(3.0)),
    "hour" -> Num(Seq(1, 3), Array(0.0, 6.0, 12.0)),
    "lat" -> Num(Seq(1, 3), Array(10.25, Double.NaN, 11.75)))

  test("struct array round trip, uncompressed") {
    val bytes = write(Seq("tracks" -> Struct(
      Seq("ens", "stormName", "annual_id", "hour", "lat"),
      Seq(track, track.updated("stormName", Str(""))
        .updated("ens", Num(Seq(1, 1), Array(4.0)))))))
    val got = read(bytes)
    assert(got.map(_._1) == Seq("tracks"))
    val st = got.head._2.asInstanceOf[Struct]
    assert(st.fieldNames ==
      Seq("ens", "stormName", "annual_id", "hour", "lat"))
    assert(st.elements.size == 2)
    assert(st.elements(0)("stormName") == Str("ALPHA"))
    assert(st.elements(1)("stormName") == Str(""))
    assert(st.elements(1)("ens").asInstanceOf[Num].data.toSeq == Seq(4.0))
    val lat = st.elements(0)("lat").asInstanceOf[Num].data
    assert(lat(0) == 10.25 && lat(1).isNaN && lat(2) == 11.75)
  }

  test("compressed round trip decodes identically to raw") {
    // Num holds Array (reference equality), so compare decoded fields
    val vars = Seq("tracks" -> Struct(Seq("hour"),
      Seq(Map("hour" -> Num(Seq(1, 2), Array(1.5, -2.5))))))
    def hours(bytes: Array[Byte]): Seq[Double] =
      read(bytes).head._2.asInstanceOf[Struct]
        .elements.head("hour").asInstanceOf[Num].data.toSeq
    assert(hours(write(vars, compress = true)) == Seq(1.5, -2.5))
    assert(hours(write(vars)) == Seq(1.5, -2.5))
  }

  test("multiple top-level variables, exotic classes skipped not fatal") {
    val vars = Seq(
      "a" -> Num(Seq(1, 2), Array(1.0, 2.0)),
      "s" -> Str("hello"),
      "t" -> Struct(Seq("x"), Seq(Map("x" -> Num(Seq(1, 1), Array(9.0))))))
    val got = read(write(vars))
    assert(got.map(_._1) == Seq("a", "s", "t"))
    assert(got(1)._2 == Str("hello"))
  }

  test("reader accepts small data elements and int16 numeric storage") {
    // hand-rolled: a 1x2 double-class array named "v" whose dims, name
    // and DATA all use forms the writer never emits — small elements
    // and miINT16 storage under mxDOUBLE class ("compressed storage")
    import java.nio.{ByteBuffer, ByteOrder}
    val body = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
    body.putInt(6).putInt(8).putInt(6).putInt(0) // flags: mxDOUBLE
    body.putInt(5).putInt(8).putInt(1).putInt(2) // dims [1,2] full tag
    body.putInt((1 << 16) | 1).put('v'.toByte).put(new Array[Byte](3)) // small name
    body.putInt((4 << 16) | 3).putShort(7.toShort).putShort(-3.toShort) // small miINT16 data
    val bodyBytes = java.util.Arrays.copyOf(body.array(), body.position())
    val out = ByteBuffer.allocate(128 + 8 + bodyBytes.length + 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put("MATLAB 5.0".padTo(116, ' ').getBytes("US-ASCII"))
    out.put(new Array[Byte](8)).putShort(0x0100.toShort)
      .put('I'.toByte).put('M'.toByte)
    out.putInt(14).putInt(bodyBytes.length).put(bodyBytes)
    val got = read(java.util.Arrays.copyOf(out.array(), out.position()))
    assert(got.map(_._1) == Seq("v"))
    assert(got.head._2.asInstanceOf[Num].dims == Seq(1, 2))
    assert(got.head._2.asInstanceOf[Num].data.toSeq == Seq(7.0, -3.0))
  }

  test("truncated header fails loudly") {
    val e = intercept[IllegalArgumentException](read(Array.fill(64)(0.toByte)))
    assert(e.getMessage.contains("128-byte header"))
  }

  // ------------------------------------------- hand-built byte images

  import java.nio.{ByteBuffer, ByteOrder}

  private def le4(i: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i).array

  private def elem(tpe: Int, payload: Array[Byte]): Array[Byte] = {
    val pad = (8 - payload.length % 8) % 8
    le4(tpe) ++ le4(payload.length) ++ payload ++ new Array[Byte](pad)
  }

  private def matHeader: Array[Byte] =
    "MATLAB 5.0".padTo(116, ' ').getBytes("US-ASCII") ++
      new Array[Byte](8) ++ Array(0x00.toByte, 0x01.toByte) ++ // LE 0x0100
      Array('I'.toByte, 'M'.toByte)

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val chunk = new Array[Byte](8192)
    while (!d.finished()) out.write(chunk, 0, d.deflate(chunk))
    d.end(); out.toByteArray
  }

  test("a miCOMPRESSED element whose inner type is not miMATRIX is a " +
      "malformed archive and fails loudly, not a silent variable drop") {
    // inner element is miINT32 (5) instead of miMATRIX (14)
    val bogusInner = elem(5, le4(42))
    val img = matHeader ++ elem(15, deflate(bogusInner))
    val e = intercept[IllegalArgumentException](read(img))
    assert(e.getMessage.contains("malformed miCOMPRESSED"))
    assert(e.getMessage.contains("inner type 5"))
  }

  test("an unsupported array class INSIDE a struct field surfaces as " +
      "Unsupported and does not poison sibling fields") {
    // struct s(1,1) with fields a (mxSPARSE, out of scope) and b (double)
    def matrixBody(clazz: Int, name: String, tail: Array[Byte]) =
      elem(6, le4(clazz) ++ le4(0)) ++          // array flags
        elem(5, le4(1) ++ le4(1)) ++            // dims 1x1
        elem(1, name.getBytes("US-ASCII")) ++   // name ("" for fields)
        tail
    val fieldA = elem(14, matrixBody(5, "", Array.empty)) // sparse: no data read
    val fieldB = elem(14, matrixBody(6, "",
      elem(9, ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putDouble(3.5).array)))
    val structBody =
      elem(6, le4(2) ++ le4(0)) ++              // flags: mxSTRUCT
        elem(5, le4(1) ++ le4(1)) ++            // dims 1x1
        elem(1, "s".getBytes("US-ASCII")) ++    // name
        elem(5, le4(4)) ++                      // field name length
        elem(1, Array[Byte](97, 0, 0, 0,
          98, 0, 0, 0)) ++                      // field names, NUL-padded
        fieldA ++ fieldB
    val img = matHeader ++ elem(14, structBody)
    val got = read(img)
    assert(got.map(_._1) == Seq("s"))
    val st = got.head._2.asInstanceOf[Struct]
    assert(st.fieldNames == Seq("a", "b"))
    assert(st.elements.head("a") == Unsupported(5))
    val b = st.elements.head("b").asInstanceOf[Num]
    assert(b.data.toSeq == Seq(3.5))
  }
}
