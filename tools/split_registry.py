#!/usr/bin/env python3
"""Registry-split helper (r13, VERDICT-r12 #4): move named query entries
(and their oracle entries) from one registry object file to a new file,
preserving every moved line byte-for-byte — the PlanDump hash-identity
protocol the Advanced -> AdvancedStreaming split used (an entry's plan
can only change if its text changes, and this tool only MOVES text).

    python3 tools/split_registry.py <src.scala> <dst.scala> <DstObject> \
        "<dst scaladoc>" q51_multimodal q91_media_batch_decode ...

The source file must follow the registry shape: a `val queries ... Map(`
literal and a `val oracles ... Map(` literal whose entries start at
column 4 with `"qNNN_..." ->`; the comment block immediately above an
entry moves with it. Imports are copied verbatim from the source file
(scalac flags nothing for unused -Ywarn settings in this build; shared
helpers stay in the source object and are referenced cross-object).
"""
import re
import sys


def chunk_entries(lines, start, end):
    """Return list of (name, first_line, last_line) entry chunks inside
    [start, end) where an entry's chunk includes the contiguous comment
    block above it."""
    headers = [i for i in range(start, end)
               if re.match(r'^    "q\w+" ->', lines[i])]
    chunks = []
    for idx, h in enumerate(headers):
        nxt = headers[idx + 1] if idx + 1 < len(headers) else end
        # walk back over the comment block (and one leading blank line)
        first = h
        while first - 1 >= start and lines[first - 1].lstrip().startswith("//"):
            first -= 1
        if first - 1 >= start and lines[first - 1].strip() == "":
            first -= 1
        # entry body runs to the line before the NEXT entry's comment
        # block; compute next chunk's first the same way
        if idx + 1 < len(headers):
            nfirst = nxt
            while (nfirst - 1 > h and
                   lines[nfirst - 1].lstrip().startswith("//")):
                nfirst -= 1
            if nfirst - 1 > h and lines[nfirst - 1].strip() == "":
                nfirst -= 1
            last = nfirst
        else:
            last = end
        name = re.match(r'^    "(q\w+)" ->', lines[h]).group(1)
        chunks.append((name, first, last))
    return chunks


def map_region(lines, marker):
    """[start, end) line range of the entries inside `val <marker> ...
    Map(` — end is the closing `  )` at two-space indent."""
    for i, ln in enumerate(lines):
        if ln.startswith(f"  val {marker}") and "Map(" in ln:
            j = i + 1
            while j < len(lines) and lines[j] != "  )":
                j += 1
            return i + 1, j
    raise SystemExit(f"no `val {marker} ... Map(` in source")


def main():
    src_path, dst_path, dst_obj, dst_doc = sys.argv[1:5]
    names = set(sys.argv[5:])
    with open(src_path) as f:
        text = f.read()
    lines = text.split("\n")

    moved = {"queries": [], "oracles": []}
    keep = lines[:]
    cut = set()
    for marker in ("queries", "oracles"):
        start, end = map_region(lines, marker)
        for name, first, last in chunk_entries(lines, start, end):
            if name in names:
                moved[marker].append((name, lines[first:last]))
                cut.update(range(first, last))
    found = {n for n, _ in moved["queries"]}
    missing = names - found
    if missing:
        raise SystemExit(f"entries not found in {src_path}: {sorted(missing)}")
    kept_lines = [ln for i, ln in enumerate(keep) if i not in cut]

    # imports: copy the source file's header imports verbatim
    header = []
    for ln in lines:
        if ln.startswith("package ") or ln.startswith("import ") or ln == "":
            header.append(ln)
        else:
            break
    while header and header[-1] == "":
        header.pop()

    def block(marker, typ):
        out = [f"  val {marker}: {typ} = Map("]
        for k, (name, chunk) in enumerate(moved[marker]):
            body = chunk[:]
            # strip one leading blank line for the first entry
            if k == 0:
                while body and body[0].strip() == "":
                    body.pop(0)
            # ensure the entry ends with a comma (last entries may not)
            for j in range(len(body) - 1, -1, -1):
                if body[j].strip():
                    if not body[j].rstrip().endswith(","):
                        body[j] = body[j].rstrip() + ","
                    break
            out.extend(body)
        out.append("  )")
        return out

    dst = header + ["", dst_doc, f"object {dst_obj} {{", ""]
    dst += block("queries", "Map[String, (SparkSession, String) => DataFrame]")
    dst += [""]
    dst += block("oracles", "Map[String, String]")
    dst += ["}", ""]

    with open(dst_path, "w") as f:
        f.write("\n".join(dst))
    with open(src_path, "w") as f:
        f.write("\n".join(kept_lines))
    print(f"moved {sorted(found)} -> {dst_path}")


if __name__ == "__main__":
    main()
