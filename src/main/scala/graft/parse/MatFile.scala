package graft.parse

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal MAT-File Level 5 codec for the syntracks intake surface —
  * the reference ingests MATLAB v5 files holding a struct array of
  * ensemble tracks via scipy's loadmat (tcdb/etl/syntracks.py:203-269).
  * Format per the public MATLAB MAT-File Format specification:
  * 128-byte header (116B text, 8B subsystem offset, uint16 version
  * 0x0100, 2-char endian indicator), then tagged data elements — each
  * an (uint32 type, uint32 byteCount) tag plus payload padded to 8
  * bytes, with a 4-byte "small data element" packing for payloads ≤ 4B.
  *
  * Reader scope (what scipy/savemat-shaped syntracks files contain):
  * - numeric arrays of any integer/float storage type, widened to Double
  * - char arrays in miINT8/miUINT8 (latin), miUTF8, miUINT16/miUTF16
  * - struct arrays (the track container), recursively
  * - zlib-compressed elements (miCOMPRESSED), the scipy default
  * - both endiannesses (the indicator chars select byte order)
  * Cell/sparse/object/complex arrays are out of scope and surface as
  * [[MatFile.Unsupported]] rather than a parse failure, so one exotic
  * variable cannot poison a file's track payload.
  *
  * The writer emits the same shape (little-endian, full tags,
  * optionally compressed) and exists for fixtures and export parity —
  * the differential gate writes with it and reads through the Spark
  * binaryFile path, so a codec asymmetry fails the diff.
  */
object MatFile {

  // data element types (MAT 5 spec, table 1-1)
  private val MiInt8 = 1
  private val MiUInt8 = 2
  private val MiInt16 = 3
  private val MiUInt16 = 4
  private val MiInt32 = 5
  private val MiUInt32 = 6
  private val MiSingle = 7
  private val MiDouble = 9
  private val MiInt64 = 12
  private val MiUInt64 = 13
  private val MiMatrix = 14
  private val MiCompressed = 15
  private val MiUtf8 = 16
  private val MiUtf16 = 17

  // array classes (table 1-3)
  private val MxStruct = 2
  private val MxChar = 4

  sealed trait Value
  /** Numeric array widened to doubles, dims as stored (column-major). */
  final case class Num(dims: Seq[Int], data: Array[Double]) extends Value
  /** Char array decoded to a String. */
  final case class Str(value: String) extends Value
  /** Struct array: ordered field names + one field→value map per
    * element (elements in stored, column-major order). */
  final case class Struct(fieldNames: Seq[String],
      elements: Seq[Map[String, Value]]) extends Value
  /** An array class outside the reader's scope (cell/sparse/object). */
  final case class Unsupported(matClass: Int) extends Value

  // ---------------------------------------------------------------- read

  /** Parse a MAT 5 byte image into its top-level (name, value) pairs. */
  def read(bytes: Array[Byte]): Seq[(String, Value)] = {
    require(bytes.length >= 128,
      s"not a MAT 5 file: ${bytes.length} bytes < 128-byte header")
    val order =
      if (bytes(126) == 'I' && bytes(127) == 'M') ByteOrder.LITTLE_ENDIAN
      else ByteOrder.BIG_ENDIAN
    val buf = ByteBuffer.wrap(bytes).order(order)
    buf.position(128)
    val out = Seq.newBuilder[(String, Value)]
    while (buf.remaining() >= 8) {
      val (tpe, payload) = readElement(buf)
      tpe match {
        case MiMatrix =>
          out += parseMatrix(wrap(payload, order), order)
        case MiCompressed =>
          val b2 = wrap(inflate(payload), order)
          val (t2, p2) = readElement(b2)
          // per the MAT 5 spec a miCOMPRESSED element holds exactly one
          // miMATRIX; anything else is a malformed archive — fail loudly
          // rather than silently dropping a variable
          require(t2 == MiMatrix,
            s"malformed miCOMPRESSED element: inner type $t2, " +
              "expected miMATRIX (14)")
          out += parseMatrix(wrap(p2, order), order)
        case _ => () // skip non-matrix top-level elements
      }
    }
    out.result()
  }

  private def wrap(b: Array[Byte], order: ByteOrder): ByteBuffer =
    ByteBuffer.wrap(b).order(order)

  /** One tagged element: returns (type, payload) and consumes padding.
    * Handles the small-data-element packing (nonzero upper half of the
    * first word = byte count ≤ 4, payload inline in the second word). */
  private def readElement(buf: ByteBuffer): (Int, Array[Byte]) = {
    val w1 = buf.getInt()
    val smallLen = (w1 >>> 16) & 0xffff
    if (smallLen != 0) {
      val data = new Array[Byte](4)
      buf.get(data)
      (w1 & 0xffff, data.take(smallLen))
    } else {
      val n = buf.getInt()
      val data = new Array[Byte](n)
      buf.get(data)
      val pad = (8 - (n % 8)) % 8
      buf.position(math.min(buf.position() + pad, buf.limit()))
      (w1, data)
    }
  }

  private def parseMatrix(buf: ByteBuffer,
      order: ByteOrder): (String, Value) = {
    val (_, flagsB) = readElement(buf)
    val matClass = wrap(flagsB, order).getInt() & 0xff
    val (_, dimsB) = readElement(buf)
    val db = wrap(dimsB, order)
    val dims = Array.fill(dimsB.length / 4)(db.getInt()).toSeq
    val (_, nameB) = readElement(buf)
    val name = new String(nameB, "US-ASCII")
    val value = matClass match {
      case MxStruct =>
        val (_, flB) = readElement(buf)
        val fieldLen = wrap(flB, order).getInt()
        val (_, fnB) = readElement(buf)
        val names = (0 until fnB.length / fieldLen).map { i =>
          val raw = fnB.slice(i * fieldLen, (i + 1) * fieldLen)
          new String(raw.takeWhile(_ != 0), "US-ASCII")
        }
        val n = dims.product
        val elements = Seq.fill(n) {
          names.map { fn =>
            val (_, p) = readElement(buf)
            fn -> parseMatrix(wrap(p, order), order)._2
          }.toMap
        }
        Struct(names, elements)
      case MxChar =>
        val (dt, dataB) = readElement(buf)
        Str(decodeChars(dt, dataB, order))
      case c if c >= 6 && c <= 15 => // numeric classes mxDOUBLE..mxUINT64
        val (dt, dataB) = readElement(buf)
        Num(dims, decodeNumeric(dt, dataB, order))
      case c => Unsupported(c)
    }
    (name, value)
  }

  private def decodeChars(dt: Int, b: Array[Byte],
      order: ByteOrder): String = dt match {
    case MiUInt16 | MiUtf16 =>
      new String(b,
        if (order == ByteOrder.LITTLE_ENDIAN) "UTF-16LE" else "UTF-16BE")
    case MiUtf8 => new String(b, "UTF-8")
    case _ => new String(b, "ISO-8859-1") // miINT8/miUINT8 latin chars
  }

  /** Widen any numeric storage type to Double (the MAT "compressed
    * storage" convention lets a double-class array store int16 data). */
  private def decodeNumeric(dt: Int, b: Array[Byte],
      order: ByteOrder): Array[Double] = {
    val buf = wrap(b, order)
    dt match {
      case MiInt8 => Array.fill(b.length)(buf.get().toDouble)
      case MiUInt8 => Array.fill(b.length)((buf.get() & 0xff).toDouble)
      case MiInt16 => Array.fill(b.length / 2)(buf.getShort().toDouble)
      case MiUInt16 =>
        Array.fill(b.length / 2)((buf.getShort() & 0xffff).toDouble)
      case MiInt32 => Array.fill(b.length / 4)(buf.getInt().toDouble)
      case MiUInt32 =>
        Array.fill(b.length / 4)((buf.getInt().toLong & 0xffffffffL).toDouble)
      case MiSingle => Array.fill(b.length / 4)(buf.getFloat().toDouble)
      case MiDouble => Array.fill(b.length / 8)(buf.getDouble())
      case MiInt64 => Array.fill(b.length / 8)(buf.getLong().toDouble)
      case MiUInt64 => Array.fill(b.length / 8)(buf.getLong().toDouble)
      case t => throw new IllegalArgumentException(
        s"unsupported numeric storage type $t")
    }
  }

  private def inflate(b: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(b)
    val out = new java.io.ByteArrayOutputStream(b.length * 4)
    val chunk = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(chunk)
      if (n == 0 && inf.needsInput())
        throw new IllegalArgumentException("truncated miCOMPRESSED element")
      out.write(chunk, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  // --------------------------------------------------------------- write

  /** Serialize top-level (name, value) pairs as a little-endian MAT 5
    * byte image; `compress` wraps each variable in miCOMPRESSED (the
    * scipy default shape). Only Num/Str/Struct values are writable. */
  def write(vars: Seq[(String, Value)], compress: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val desc = "MATLAB 5.0 MAT-file, graft MatFile codec"
      .padTo(116, ' ').getBytes("US-ASCII")
    out.write(desc, 0, 116)
    out.write(new Array[Byte](8), 0, 8) // subsystem offset
    out.write(le2(0x0100), 0, 2) // version
    out.write('I'); out.write('M')
    vars.foreach { case (name, v) =>
      val m = element(MiMatrix, matrixBody(name, v))
      out.write(if (compress) element(MiCompressed, deflate(m)) else m)
    }
    out.toByteArray
  }

  def writeFile(path: java.io.File, vars: Seq[(String, Value)],
      compress: Boolean = false): Unit = {
    java.nio.file.Files.write(path.toPath, write(vars, compress))
    ()
  }

  private def le2(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def le4(v: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(v); b.array()
  }

  /** Full-tag element with 8-byte payload padding (the writer never
    * uses the small-element packing; the reader accepts both). */
  private def element(tpe: Int, payload: Array[Byte]): Array[Byte] = {
    val pad = (8 - (payload.length % 8)) % 8
    val b = ByteBuffer.allocate(8 + payload.length + pad)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(tpe); b.putInt(payload.length); b.put(payload)
    b.array()
  }

  private def matrixBody(name: String, v: Value): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def flags(matClass: Int): Unit =
      out.write(element(MiUInt32, le4(matClass) ++ le4(0)))
    def dims(d: Seq[Int]): Unit =
      out.write(element(MiInt32, d.flatMap(le4).toArray))
    def nameEl(): Unit =
      out.write(element(MiInt8, name.getBytes("US-ASCII")))
    v match {
      case Num(d, data) =>
        flags(6) // mxDOUBLE_CLASS
        dims(d)
        nameEl()
        val b = ByteBuffer.allocate(data.length * 8)
          .order(ByteOrder.LITTLE_ENDIAN)
        data.foreach(b.putDouble)
        out.write(element(MiDouble, b.array()))
      case Str(s) =>
        flags(MxChar)
        dims(Seq(if (s.isEmpty) 0 else 1, s.length))
        nameEl()
        out.write(element(MiUInt16, s.getBytes("UTF-16LE")))
      case Struct(fieldNames, elements) =>
        flags(MxStruct)
        dims(Seq(1, elements.length))
        nameEl()
        val fieldLen = 32
        out.write(element(MiInt32, le4(fieldLen)))
        out.write(element(MiInt8, fieldNames.flatMap(fn =>
          fn.getBytes("US-ASCII").padTo(fieldLen, 0.toByte)).toArray))
        elements.foreach(el => fieldNames.foreach { fn =>
          out.write(element(MiMatrix, matrixBody("", el(fn))))
        })
      case Unsupported(c) =>
        throw new IllegalArgumentException(s"cannot write class $c")
    }
    out.toByteArray
  }

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream(b.length)
    val chunk = new Array[Byte](8192)
    while (!d.finished()) out.write(chunk, 0, d.deflate(chunk))
    d.end()
    out.toByteArray
  }
}
