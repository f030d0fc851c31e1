package graft.ops

/** Runtime loader for MPEG-1 Layer-III B.7 big-values Huffman tables
  * (r18 — the data seam for tables 11/15/16–31): their transcriptions
  * are UNVERIFIABLE in this environment (the r17 attempt measured
  * Kraft/prefix damage with no unique minimal repair — README
  * provenance note), so verified table data arrives as DEPLOYMENT
  * CONFIG through this parser instead of as code. Every loaded table
  * must pass the SAME structural discipline the shipped tables pass —
  * Kraft completeness, prefix-freeness, per-cell decode round-trip
  * (escape extension included) — or the load fails loudly; a table
  * that parses but is wrong CANNOT reach the decoder.
  *
  * File format (line-oriented, `#` comments and blank lines ignored):
  * {{{
  * table <id> size <n> linbits <l>
  * <n·n lines: "<hlen> <hcod>">    # row-major: cell (x, y) at x·n + y
  * end
  * }}}
  * Multiple `table … end` blocks per file. Ids must be unshipped,
  * unreserved B.7 slots (11, 15, 16–31); `size` is the square grid edge
  * length (16 for tables 16–31, whose maxVal 15 escapes through
  * `linbits` extra bits per ISO 11172-3 §2.4.3.4.6).
  */
object Mp3Tables {
  import Mp3Codec.{BigTable, BigTables, pairTable, BitReader, decodeBigPair}

  private val Header = """table\s+(\d+)\s+size\s+(\d+)\s+linbits\s+(\d+)""".r
  private val Cell = """(\d+)\s+(\d+)""".r

  def parseTableFile(text: String): Map[Int, BigTable] = {
    val lines = text.split("\n").map(_.trim).zipWithIndex
      .filter { case (l, _) => l.nonEmpty && !l.startsWith("#") }.toVector
    val out = scala.collection.mutable.LinkedHashMap.empty[Int, BigTable]
    var i = 0
    def fail(ln: Int, msg: String): Nothing =
      throw new IllegalArgumentException(s"Mp3Tables line ${ln + 1}: $msg")
    while (i < lines.length) {
      val (hdr, hln) = lines(i)
      hdr match {
        case Header(idS, nS, lS) =>
          val id = idS.toInt; val n = nS.toInt; val linbits = lS.toInt
          if (id < 1 || id > 31) fail(hln, s"table id out of range: $id")
          if (id == 4 || id == 14) fail(hln, s"table $id is a spec-reserved slot")
          if (BigTables.contains(id))
            fail(hln, s"table $id is shipped and verified; loaded data may not override it")
          if (out.contains(id)) fail(hln, s"table $id defined twice")
          if (n < 2 || n > 16) fail(hln, s"table $id: size out of range: $n")
          if (linbits < 0 || linbits > 16) fail(hln, s"table $id: linbits out of range: $linbits")
          val cells = new Array[(Int, Int, Int, Int)](n * n) // (x, y, len, code)
          var c = 0
          i += 1
          while (c < n * n) {
            if (i >= lines.length) fail(hln, s"table $id: expected ${n * n} cells, file ended at $c")
            val (cl, cln) = lines(i)
            cl match {
              case Cell(lenS, codeS) =>
                val len = lenS.toInt; val code = codeS.toInt
                if (len < 1 || len > 19) fail(cln, s"table $id cell $c: hlen out of range: $len")
                if (code < 0 || code >= (1 << len))
                  fail(cln, s"table $id cell $c: hcod $code does not fit in $len bits")
                cells(c) = (c / n, c % n, len, code)
              case "end" => fail(cln, s"table $id: expected ${n * n} cells, got $c")
              case other => fail(cln, s"table $id cell $c: expected '<hlen> <hcod>', got '$other'")
            }
            c += 1; i += 1
          }
          if (i >= lines.length || lines(i)._1 != "end")
            fail(if (i < lines.length) lines(i)._2 else hln, s"table $id: missing 'end'")
          i += 1
          out(id) = validated(id, n, linbits, cells, hln, fail)
        case other => fail(hln, s"expected 'table <id> size <n> linbits <l>', got '$other'")
      }
    }
    out.toMap
  }

  /** The shipped-table discipline, enforced at load time: unique codes,
    * prefix-freeness, EXACT Kraft completeness (integer arithmetic at
    * the 19-bit max length — a complete prefix code is what makes every
    * bit pattern decodable, the property transcription errors break),
    * and a per-cell decode round-trip through the REAL
    * [[Mp3Codec.decodeBigPair]] path, escape extension included.
    */
  private def validated(id: Int, n: Int, linbits: Int,
                        cells: Array[(Int, Int, Int, Int)], ln: Int,
                        fail: (Int, String) => Nothing): BigTable = {
    val codes = cells.map { case (_, _, len, code) => (len, code) }
    if (codes.distinct.length != codes.length)
      fail(ln, s"table $id: duplicate (hlen, hcod) codewords")
    for {
      pair <- codes.sortBy(_._1).toSeq.combinations(2)
      Seq((l1, c1), (l2, c2)) = pair
    } {
      if ((c2 >> (l2 - l1)) == c1)
        fail(ln, s"table $id: ($l1, $c1) is a prefix of ($l2, $c2) — not prefix-free")
    }
    val kraft = cells.map { case (_, _, len, _) => 1L << (19 - len) }.sum
    if (kraft != (1L << 19))
      fail(ln, s"table $id: Kraft sum ${kraft}/${1L << 19} — " +
        (if (kraft < (1L << 19)) s"INCOMPLETE (deficit ${(1L << 19) - kraft})"
         else s"OVERCOMPLETE (excess ${kraft - (1L << 19)})"))
    val t = BigTable(pairTable(cells.toSeq.map { case (x, y, l, c) => (x, y, l, c) }),
      maxVal = n - 1, linbits = linbits)
    // round-trip every cell through the real decode path: plain codes,
    // and for maxVal cells the linbits escape with an all-ones extension
    for ((x, y, len, code) <- cells; ext <- Seq(0, if (linbits > 0) -1 else 0).distinct) {
      val bits = scala.collection.mutable.ArrayBuffer.empty[Int]
      def put(v: Int, w: Int): Unit = for (k <- (w - 1) to 0 by -1) bits += ((v >> k) & 1)
      put(code, len)
      val extV = if (ext == 0) 0 else (1 << linbits) - 1
      val xe = if (linbits > 0 && x == n - 1) x + extV else x
      val ye = if (linbits > 0 && y == n - 1) y + extV else y
      if (linbits > 0 && x == n - 1) put(extV, linbits)
      if (xe != 0) put(0, 1) // positive sign
      if (linbits > 0 && y == n - 1) put(extV, linbits)
      if (ye != 0) put(0, 1)
      val bytes = new Array[Byte]((bits.length + 7) / 8)
      bits.zipWithIndex.foreach { case (b, k) =>
        if (b == 1) bytes(k / 8) = (bytes(k / 8) | (1 << (7 - k % 8))).toByte
      }
      val r = new BitReader(bytes, 0L)
      val got = decodeBigPair(r, t)
      if (got != ((xe, ye)))
        fail(ln, s"table $id: cell ($x, $y) round-trips to $got, expected ($xe, $ye)")
    }
    t
  }
}
