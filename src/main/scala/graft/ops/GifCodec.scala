package graft.ops

/** From-scratch GIF decoder (87a/89a): logical-screen + image-descriptor
  * walk, global/local color tables, and a full GIF-variant LZW decode
  * (LSB-first variable-width codes, CLEAR/END, dictionary growth to 4096,
  * the K-K-K "code == next" case) — the last still-image format that was
  * still riding ImageIO. Emits the FIRST image frame as palette-expanded
  * RGB in the engine-wide [[PngCodec.Image]] shape (matching what the
  * ImageIO path produced for indexed rasters, so downstream stats/dHash
  * values are unchanged). Interlaced images decode via the standard
  * 8/8/4/2 four-pass row order. Extensions (GCE/comment/application) are
  * length-prefixed skips; transparency has no channel in the 3-channel
  * output, exactly like the indexed→RGB conversion before it.
  *
  * Robustness contract (codec family): malformed, hostile or truncated
  * input yields `None`, never a throw; an LZW stream that ends before
  * filling width×height pixels is truncation, not a partial image.
  */
object GifCodec {

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  def decode(bytes: Array[Byte]): Option[PngCodec.Image] = {
    try {
      if (bytes == null || bytes.length < 13) return None
      val sig = new String(bytes, 0, 6, "US-ASCII")
      if (sig != "GIF87a" && sig != "GIF89a") return None
      var p = 6
      val screenW = le16(bytes, p); val screenH = le16(bytes, p + 2)
      val packed = bytes(p + 4) & 0xFF
      p += 7
      var gct: Array[Byte] = null
      if ((packed & 0x80) != 0) {
        val n = 3 * (2 << (packed & 7))
        if (p + n > bytes.length) return None
        gct = java.util.Arrays.copyOfRange(bytes, p, p + n)
        p += n
      }
      if (screenW <= 0 || screenH <= 0) return None

      while (p < bytes.length) {
        (bytes(p) & 0xFF) match {
          case 0x21 => // extension: label byte, then length-prefixed sub-blocks
            p += 2
            while (p < bytes.length && (bytes(p) & 0xFF) != 0) p += 1 + (bytes(p) & 0xFF)
            p += 1
          case 0x2C => // image descriptor — decode and return the first frame
            if (p + 10 > bytes.length) return None
            val w = le16(bytes, p + 5); val h = le16(bytes, p + 7)
            val ipacked = bytes(p + 9) & 0xFF
            val interlaced = (ipacked & 0x40) != 0
            p += 10
            var pal = gct
            if ((ipacked & 0x80) != 0) {
              val n = 3 * (2 << (ipacked & 7))
              if (p + n > bytes.length) return None
              pal = java.util.Arrays.copyOfRange(bytes, p, p + n)
              p += n
            }
            if (pal == null || w <= 0 || h <= 0) return None
            if (w.toLong * h * 3 > (1L << 26)) return None
            if (p >= bytes.length) return None
            val minCodeSize = bytes(p) & 0xFF
            p += 1
            if (minCodeSize < 2 || minCodeSize > 8) return None
            // concatenate the data sub-blocks
            val data = new java.io.ByteArrayOutputStream()
            while (p < bytes.length && (bytes(p) & 0xFF) != 0) {
              val len = bytes(p) & 0xFF
              if (p + 1 + len > bytes.length) return None
              data.write(bytes, p + 1, len)
              p += 1 + len
            }
            val indices = lzwDecode(data.toByteArray, minCodeSize, w * h)
              .getOrElse(return None)
            // palette expansion; interlaced rows arrive in the standard
            // 8/8/4/2 pass order and land at their true y
            val out = new Array[Byte](w * h * 3)
            val rowOrder: Array[Int] =
              if (!interlaced) Array.tabulate(h)(identity)
              else {
                val order = new Array[Int](h)
                var i = 0
                for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                     yy <- start until h by step) { order(i) = yy; i += 1 }
                order
              }
            var srcRow = 0
            while (srcRow < h) {
              val destY = rowOrder(srcRow)
              var x = 0
              while (x < w) {
                val idx = (indices(srcRow * w + x) & 0xFF) * 3
                if (idx + 2 >= pal.length) return None
                val d = (destY * w + x) * 3
                out(d) = pal(idx); out(d + 1) = pal(idx + 1); out(d + 2) = pal(idx + 2)
                x += 1
              }
              srcRow += 1
            }
            return Some(PngCodec.Image(w, h, 3, out))
          case 0x3B => return None // trailer before any image
          case _ => return None
        }
      }
      None
    } catch { case _: Throwable => None }
  }

  /** Decoded animation: full-canvas composited frames + per-frame delay
    * (centiseconds, 0 when the frame had no GCE).
    */
  final case class GifAnimation(width: Int, height: Int,
                                frames: Array[PngCodec.Image], delaysCs: Array[Int])

  /** ANIMATED decode: every frame composited onto the logical-screen
    * canvas the way a viewer renders it — sub-rect frames update their
    * rect, GCE transparency keeps the underlying canvas pixel, disposal
    * 2 restores the background color after the frame, disposal 3
    * restores the previous canvas (0/1 leave the canvas). This is what
    * the video-style ops (frame sampling / stats / dedup) consume: a
    * re-cut or re-timed GIF is not frame-identical. `maxFrames` bounds
    * memory (a hostile GIF can declare thousands of frames).
    */
  def decodeFrames(bytes: Array[Byte], maxFrames: Int = 256): Option[GifAnimation] = {
    try {
      if (bytes == null || bytes.length < 13) return None
      val sig = new String(bytes, 0, 6, "US-ASCII")
      if (sig != "GIF87a" && sig != "GIF89a") return None
      var p = 6
      val screenW = le16(bytes, p); val screenH = le16(bytes, p + 2)
      val packed = bytes(p + 4) & 0xFF
      val bgIndex = bytes(p + 5) & 0xFF
      p += 7
      var gct: Array[Byte] = null
      if ((packed & 0x80) != 0) {
        val n = 3 * (2 << (packed & 7))
        if (p + n > bytes.length) return None
        gct = java.util.Arrays.copyOfRange(bytes, p, p + n)
        p += n
      }
      if (screenW <= 0 || screenH <= 0) return None
      if (screenW.toLong * screenH * 3 > (1L << 26)) return None
      val bg = new Array[Byte](3)
      if (gct != null && bgIndex * 3 + 2 < gct.length) {
        bg(0) = gct(bgIndex * 3); bg(1) = gct(bgIndex * 3 + 1); bg(2) = gct(bgIndex * 3 + 2)
      }
      val canvas = new Array[Byte](screenW * screenH * 3)
      var i = 0
      while (i < canvas.length) { canvas(i) = bg(i % 3); i += 1 }
      val frames = scala.collection.mutable.ArrayBuffer.empty[PngCodec.Image]
      val delays = scala.collection.mutable.ArrayBuffer.empty[Int]
      var disposal = 0
      var transparent = -1
      var delayCs = 0
      while (p < bytes.length && frames.length < maxFrames) {
        (bytes(p) & 0xFF) match {
          case 0x21 =>
            val label = if (p + 1 < bytes.length) bytes(p + 1) & 0xFF else -1
            if (label == 0xF9 && p + 7 < bytes.length && (bytes(p + 2) & 0xFF) >= 4) {
              val gp = bytes(p + 3) & 0xFF
              disposal = (gp >> 2) & 7
              delayCs = le16(bytes, p + 4)
              transparent = if ((gp & 1) != 0) bytes(p + 6) & 0xFF else -1
            }
            p += 2
            while (p < bytes.length && (bytes(p) & 0xFF) != 0) p += 1 + (bytes(p) & 0xFF)
            p += 1
          case 0x2C =>
            if (p + 10 > bytes.length) return None
            val left = le16(bytes, p + 1); val top = le16(bytes, p + 3)
            val w = le16(bytes, p + 5); val h = le16(bytes, p + 7)
            val ipacked = bytes(p + 9) & 0xFF
            val interlaced = (ipacked & 0x40) != 0
            p += 10
            var pal = gct
            if ((ipacked & 0x80) != 0) {
              val n = 3 * (2 << (ipacked & 7))
              if (p + n > bytes.length) return None
              pal = java.util.Arrays.copyOfRange(bytes, p, p + n)
              p += n
            }
            if (pal == null || w <= 0 || h <= 0) return None
            if (left + w > screenW || top + h > screenH) return None
            if (p >= bytes.length) return None
            val minCodeSize = bytes(p) & 0xFF
            p += 1
            if (minCodeSize < 2 || minCodeSize > 8) return None
            val data = new java.io.ByteArrayOutputStream()
            while (p < bytes.length && (bytes(p) & 0xFF) != 0) {
              val len = bytes(p) & 0xFF
              if (p + 1 + len > bytes.length) return None
              data.write(bytes, p + 1, len)
              p += 1 + len
            }
            p += 1 // sub-block terminator
            val indices = lzwDecode(data.toByteArray, minCodeSize, w * h)
              .getOrElse(return None)
            val before = if (disposal == 3) canvas.clone() else null
            val rowOrder: Array[Int] =
              if (!interlaced) Array.tabulate(h)(identity)
              else {
                val order = new Array[Int](h)
                var k = 0
                for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                     yy <- start until h by step) { order(k) = yy; k += 1 }
                order
              }
            var srcRow = 0
            while (srcRow < h) {
              val destY = top + rowOrder(srcRow)
              var x = 0
              while (x < w) {
                val pi = indices(srcRow * w + x) & 0xFF
                if (pi != transparent) {
                  val idx = pi * 3
                  if (idx + 2 >= pal.length) return None
                  val d = (destY * screenW + left + x) * 3
                  canvas(d) = pal(idx); canvas(d + 1) = pal(idx + 1); canvas(d + 2) = pal(idx + 2)
                }
                x += 1
              }
              srcRow += 1
            }
            frames += PngCodec.Image(screenW, screenH, 3, canvas.clone())
            delays += delayCs
            disposal match {
              case 2 => // restore rect to background
                var y = top
                while (y < top + h) {
                  var x = left
                  while (x < left + w) {
                    val d = (y * screenW + x) * 3
                    canvas(d) = bg(0); canvas(d + 1) = bg(1); canvas(d + 2) = bg(2)
                    x += 1
                  }
                  y += 1
                }
              case 3 => System.arraycopy(before, 0, canvas, 0, canvas.length)
              case _ => ()
            }
            disposal = 0; transparent = -1; delayCs = 0
          case 0x3B =>
            return if (frames.isEmpty) None
              else Some(GifAnimation(screenW, screenH, frames.toArray, delays.toArray))
          case _ => return None
        }
      }
      if (frames.isEmpty) None
      else Some(GifAnimation(screenW, screenH, frames.toArray, delays.toArray))
    } catch { case _: Throwable => None }
  }

  /** GIF-variant LZW: LSB-first packed variable-width codes, dictionary
    * of (prefix, suffix) pairs growing to 4096, CLEAR resets, END stops.
    * Returns exactly `nPixels` indices or None (truncated / corrupt).
    */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int,
                        nPixels: Int): Option[Array[Byte]] = {
    val clear = 1 << minCodeSize
    val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](nPixels)
    var outPos = 0
    var codeSize = minCodeSize + 1
    var next = end + 1
    var prev = -1
    var acc = 0L
    var nbits = 0
    var pos = 0
    while (outPos < nPixels) {
      while (nbits < codeSize) {
        if (pos >= data.length) return None
        acc |= (data(pos) & 0xFFL) << nbits
        nbits += 8
        pos += 1
      }
      val code = (acc & ((1 << codeSize) - 1)).toInt
      acc >>>= codeSize
      nbits -= codeSize
      if (code == clear) {
        codeSize = minCodeSize + 1
        next = end + 1
        prev = -1
      } else if (code == end) {
        return if (outPos == nPixels) Some(out) else None
      } else {
        var sp = 0
        var cur = code
        if (code >= next) {
          // the K-K-K case: code == next is string(prev) + firstChar(prev);
          // anything beyond next is corrupt
          if (code != next || prev < 0) return None
          // first char of prev's expansion
          var c = prev
          while (c >= clear) c = prefix(c)
          stack(sp) = c.toByte; sp += 1
          cur = prev
        }
        while (cur >= clear + 2) {
          stack(sp) = suffix(cur); sp += 1
          cur = prefix(cur)
        }
        if (cur >= clear) return None // dangling reserved code
        stack(sp) = cur.toByte; sp += 1
        // pop the stack into the output
        while (sp > 0 && outPos < nPixels) {
          sp -= 1
          out(outPos) = stack(sp); outPos += 1
        }
        if (sp > 0) return None // produced more pixels than the image holds
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev
          suffix(next) = {
            var c = code
            while (c >= clear) c = prefix(c)
            c.toByte
          }
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    Some(out)
  }
}
