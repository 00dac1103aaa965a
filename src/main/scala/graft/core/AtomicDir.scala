package graft.core

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Versioned-directory + pointer-file publication — the crash-safe
  * commit protocol shared by every production-shaped directory sink
  * (the ANN index promotion, the x144 shard writer).
  *
  * Layout: `root/v<N>/` version dirs plus a `root/CURRENT` pointer file
  * whose content names the live version. Publication moves the staged
  * dir into `root` (atomic same-fs rename — invisible, nothing points
  * at it yet), then rewrites `CURRENT` via write-temp + ATOMIC_MOVE.
  * The live name always resolves: a reader sees the old pointer (its
  * version dir is never touched) or the new one, never an absent or
  * half-written state; a crash at any instant leaves a consistent root
  * (at worst an orphaned staged dir a later overwrite reclaims). Prior
  * versions stay for rollback/audit — re-promote by rewriting
  * `CURRENT`; delete explicitly once no reader can hold the pointer.
  *
  * Two individually-atomic renames (live→retired, new→live) do NOT
  * compose to this: between them the live name resolves to nothing —
  * the hole this protocol exists to close. */
object AtomicDir {

  /** The live version path under `root` — what readers open. */
  def current(root: String): String =
    Paths.get(root, Files.readString(Paths.get(root, "CURRENT")).trim)
      .toString

  /** Publish `stagedDir` as the next version under `root`; returns the
    * promoted path. `stagedDir` must be on the same filesystem.
    *
    * SINGLE WRITER: version numbering is read-then-move, so two
    * concurrent promoters can claim the same v<N> — the loser's
    * ATOMIC_MOVE fails loudly (FileAlreadyExists/DirectoryNotEmpty)
    * and the root stays consistent, but callers must serialize
    * promotions (every current caller is a single driver-side sink). */
  def promote(root: String, stagedDir: String): String = {
    val rootP = Paths.get(root)
    Files.createDirectories(rootP)
    val vPat = "v(\\d+)".r
    // Files.list holds an open directory handle — close it or every
    // promote leaks a file descriptor
    val listing = Files.list(rootP)
    val next = try {
      listing.iterator().asScala
        .flatMap(p => p.getFileName.toString match {
          case vPat(n) => Some(n.toLong); case _ => None
        }).foldLeft(0L)(math.max) + 1
    } finally listing.close()
    val dst = rootP.resolve(s"v$next")
    Files.move(Paths.get(stagedDir), dst, StandardCopyOption.ATOMIC_MOVE)
    val tmp = rootP.resolve("CURRENT.tmp")
    Files.writeString(tmp, s"v$next\n")
    Files.move(tmp, rootP.resolve("CURRENT"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    dst.toString
  }
}
