package graft

/** Dev harness (not part of the driver contract): current use — GIF
  * decode path debugging.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val img = new java.awt.image.BufferedImage(5, 3,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until 3; x <- 0 until 5) img.setRGB(x, y, 0xFFFFFF)
    val out = new java.io.ByteArrayOutputStream()
    println("write=" + javax.imageio.ImageIO.write(img, "gif", out))
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.toByteArray))
    println("cm=" + back.getColorModel.getClass.getName +
      " isIndex=" + back.getColorModel.isInstanceOf[java.awt.image.IndexColorModel] +
      " compSize=" + back.getColorModel.getComponentSize.toSeq)
    val got = ops.Multimodal.decodeImage(out.toByteArray)
    println("decoded=" + got.map(i => (i.width, i.height, i.channels)))
    got.foreach(i => println("pixels=" + i.pixels.map(_ & 0xFF).toSeq.distinct))
  }
}
