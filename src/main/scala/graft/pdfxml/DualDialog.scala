package graft.pdfxml

import graft.model.{NumberObj, Php}

import scala.collection.mutable.ArrayBuffer

/** Dual-dialog recovery (reference ParseText.php:1412-1563): adjacent
  * same-row single-line Character pairs start a two-column region; following
  * blocks are assigned to the left/right column by x, merged lines are split
  * on the widest 3..9-space gap left of the second character's x, and the
  * right column is spliced back in after the left column ends.
  */
object DualDialog {

  private def mkBlock(line: String, x: Int, y: Int, width: Int, fontSize: Int,
      num: NumberObj): Block =
    new Block(new BlockPiece(line, x, y, width, Map.empty, fontSize, Map.empty, num))

  private def dialogKind(b: Block): String = if (b.isEntirelyParens) "Paren" else "Dialog"

  def recover(blocks: ArrayBuffer[Block]): Unit = {
    var numBlocks = blocks.length
    var bx = 0
    while (bx < numBlocks) {
      if (bx + 2 >= numBlocks) return
      val character1 = blocks(bx)
      val character2 = blocks(bx + 1)
      val dialog2Spliced = new ArrayBuffer[Block]

      if (character1.y == character2.y && character1.height == 1 && character2.height == 1 &&
          LooksLike.character(character1.lines(0)) && LooksLike.character(character2.lines(0))) {

        var prev1: Block = character1
        var prev2: Block = character2
        var lastDialog1 = -1

        var bxSearch = bx + 2
        var broke = false
        while (bxSearch < numBlocks && !broke) {
          val block = blocks(bxSearch)
          val inChar1Range = block.x < character1.x + 5 * Consts.DefaultCharWidth
          var isDialog1 = false
          if (block.isBlank) broke = true
          else if (block.y == prev1.y + prev1.height && inChar1Range) isDialog1 = true
          else if (block.y == prev2.y + prev2.height && !inChar1Range) isDialog1 = false
          else broke = true

          if (!broke) {
            if (isDialog1) {
              var i = 0
              while (i < block.height) {
                val next = if (bxSearch + 1 < numBlocks) blocks(bxSearch + 1) else null
                if (block.y + i == prev2.y + prev2.height) {
                  if (next == null || next.y != block.y + i) {
                    // no right-column block on this row: split this line on
                    // the widest space gap left of character2.x (:1455-1496)
                    val line = block.lines(i)
                    var lastGapStr: String = null
                    var gapSize = 3
                    var stop = false
                    while (gapSize < 10 && !stop) {
                      val gapStr = " " * gapSize
                      if (Php.mbStrpos(line, gapStr) < 0) stop = true
                      else lastGapStr = gapStr
                      gapSize += 1
                    }
                    var splitPos = -1
                    if (lastGapStr != null) {
                      var pos = 0
                      var search = true
                      while (search) {
                        pos = Php.mbStrpos(line, lastGapStr, pos + Php.mbLen(lastGapStr))
                        if (pos >= 0) {
                          if (block.x + pos < character2.x) splitPos = pos
                        } else search = false
                      }
                    }
                    if (splitPos >= 0) {
                      val secondLine = Php.trim(Php.mbSubstr(line, splitPos + 1))
                      val secondX = block.x + (Php.mbLen(line) - Php.mbLen(secondLine)) * Consts.DefaultCharWidth
                      block.setLine(i, Php.trim(Php.mbSubstr(line, 0, splitPos)))
                      val secondWidth = Php.mbLen(secondLine) * Consts.DefaultCharWidth
                      if (math.abs(secondX - prev2.x) > 2 * Consts.DefaultCharWidth) {
                        prev2 = mkBlock(secondLine, secondX, block.y + i, secondWidth,
                          block.fontSize, block.numberObject)
                        prev2.kind = dialogKind(prev2)
                        dialog2Spliced += prev2
                      } else {
                        prev2.combine(new BlockPiece(secondLine, secondX, block.y + i,
                          secondWidth, Map.empty, block.fontSize, Map.empty, block.numberObject))
                      }
                    }
                  } else {
                    // right-column block sits on this row (:1497-1514)
                    if (math.abs(next.x - prev2.x) > 2 * Consts.DefaultCharWidth) {
                      prev2 = next
                      prev2.kind = dialogKind(prev2)
                      dialog2Spliced += prev2
                    } else {
                      next.lines.zipWithIndex.foreach { case (line, numL) =>
                        prev2.combine(new BlockPiece(line, next.x, next.y + numL,
                          Php.mbLen(line) * Consts.DefaultCharWidth, Map.empty,
                          next.fontSize, Map.empty, block.numberObject))
                      }
                    }
                    blocks.remove(bxSearch + 1)
                    numBlocks = blocks.length
                  }
                }
                i += 1
              }
              prev1 = block
              prev1.kind = dialogKind(prev1)
              lastDialog1 = bxSearch
            } else {
              if (prev1 eq character1) broke = true
              else {
                prev2 = block
                prev2.kind = dialogKind(prev2)
                dialog2Spliced += prev2
                blocks.remove(bxSearch)
                numBlocks = blocks.length
                bxSearch -= 1
              }
            }
          }
          if (!broke) bxSearch += 1
        }

        if (dialog2Spliced.nonEmpty && lastDialog1 >= 0) {
          character1.kind = "Character"
          character2.kind = "Character"
          character1.hasDualLine = true
          character2.isDualLine = true

          blocks.remove(bx + 1) // pull character2 out (:1543)
          val toInsert = character2 +: dialog2Spliced
          blocks.insertAll(lastDialog1, toInsert) // splice after left column (:1547)
          bx = lastDialog1 + toInsert.length - 1
          numBlocks = blocks.length
          if (bx + 1 < numBlocks && blocks(bx + 1).kind == "Dialog")
            blocks(bx + 1).kind = "Action" // (:1556-1559)
        }
      }
      bx += 1
    }
  }
}
