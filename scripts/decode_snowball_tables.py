#!/usr/bin/env python
"""Decode Snowball ``among`` tables out of PostgreSQL's compiled
``dict_snowball.so`` (public PostgreSQL/Snowball BSD code).

The Snowball compiler emits, per language, ``static const struct among
a_N[] = {...}`` arrays. On x86-64 the record layout is 32 bytes:

    int s_size; (4)  pad (4)  const symbol *s; (8)
    int substring_i; (4)  int result; (4)  int (*function)(); (8)

``s`` points into ``.rodata``; the among arrays themselves live in
``.data.rel.ro`` (the pointers need relocation). We scan that section
for runs of plausible records and print each table with its virtual
address plus decoded suffix strings, so a port can be developed from
the REAL tables instead of reconstructing them from memory.

Attribution of a table to a language is done by content (script /
orthography / known suffix inventory) and verified end-to-end by the
oracle fuzz loop (scripts/iter_lang.py) — zero mismatches means the
tables AND the control flow are right.

Usage: python scripts/decode_snowball_tables.py [out.txt]
"""

from __future__ import annotations

import struct
import sys

SO = "/usr/lib/postgresql/15/lib/dict_snowball.so"

# from readelf -SW: [14] .rodata  addr 0x61000 off 0x61000 size 0xf9e8
#                   [19] .data.rel.ro addr 0x74e00 off 0x73e00 size 0x4fe50
RO_ADDR, RO_OFF, RO_SZ = 0x61000, 0x61000, 0xF9E8
DR_ADDR, DR_OFF, DR_SZ = 0x74E00, 0x73E00, 0x4FE50


def main() -> None:
    f = open(SO, "rb").read()
    dr = f[DR_OFF : DR_OFF + DR_SZ]

    def rodata_str(addr: int, size: int) -> str:
        off = addr - RO_ADDR + RO_OFF
        return f[off : off + size].decode("utf-8", "replace")

    records = []
    i = 0
    while i + 32 <= len(dr):
        s_size, pad, ptr, sub_i, result, func = struct.unpack_from(
            "<iiqiiq", dr, i
        )
        if (
            1 <= s_size <= 40
            and pad == 0
            and RO_ADDR <= ptr < RO_ADDR + RO_SZ
            and -1 <= sub_i <= 400
            and -1 <= result <= 400
        ):
            records.append((i, s_size, ptr, sub_i, result, func))
            i += 32
        else:
            i += 8

    tables = []
    cur: list = []
    prev_end = None
    for rec in records:
        if prev_end is not None and rec[0] != prev_end:
            if len(cur) >= 2:
                tables.append(cur)
            cur = []
        cur.append(rec)
        prev_end = rec[0] + 32
    if len(cur) >= 2:
        tables.append(cur)

    out = open(sys.argv[1], "w", encoding="utf-8") if len(sys.argv) > 1 else sys.stdout
    print(f"# {len(tables)} tables", file=out)
    for ti, t in enumerate(tables):
        addr = DR_ADDR + t[0][0]
        print(f"== table {ti} @0x{addr:x} ({len(t)})", file=out)
        for (off, s_size, ptr, sub_i, result, func) in t:
            s = rodata_str(ptr, s_size)
            print(
                f"  {s!r} sub={sub_i} res={result} fn={func != 0}",
                file=out,
            )


if __name__ == "__main__":
    main()
