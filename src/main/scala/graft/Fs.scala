package graft

import java.nio.file.{Files, LinkOption, Path}

/** Shared filesystem helpers for the temp-dir-heavy verification mains
  * and the dynamic runners — ONE recursive delete so an edge-case fix
  * (symlinks, concurrent writers) cannot silently diverge between
  * copies (the Jsons precedent: the locale bug had to be patched in
  * four places before it was centralized).
  */
private[graft] object Fs {

  /** Best-effort recursive delete. NOFOLLOW: a symlink is deleted as a
    * link, never walked into — a link escaping the temp dir must not
    * let cleanup delete foreign files.
    */
  def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p, LinkOption.NOFOLLOW_LINKS))
      Option(p.toFile.listFiles()).getOrElse(Array.empty)
        .foreach(f => deleteRecursively(f.toPath))
    try Files.deleteIfExists(p)
    catch { case _: java.io.IOException => () }
  }
}
