#!/usr/bin/env python
"""Dump a Snowball among table from dict_snowball.so at a virtual
address (from find_among_b disassembly) with a given entry count.

Usage: python /tmp/among.py 0x8e240 19
       python /tmp/among.py str 0x64f72 10   # dump rodata string
"""
import struct, sys

SO = "/usr/lib/postgresql/15/lib/dict_snowball.so"
data = open(SO, "rb").read()
# section map: vaddr == file offset for .rodata; .data.rel.ro shifted
RO_ADDR, RO_OFF = 0x61000, 0x61000
DR_ADDR, DR_OFF = 0x74E00, 0x73E00


def vread(addr, size):
    if addr >= DR_ADDR:
        off = addr - DR_ADDR + DR_OFF
    else:
        off = addr - RO_ADDR + RO_OFF
    return data[off : off + size]


def rostr(addr, size):
    return vread(addr, size).decode("utf-8", "replace")


if sys.argv[1] == "str":
    addr = int(sys.argv[2], 16)
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    raw = vread(addr, n)
    print(repr(raw.decode("utf-8", "replace")))
    sys.exit()

addr = int(sys.argv[1], 16)
count = int(sys.argv[2])
for i in range(count):
    s_size, pad, ptr, sub_i, result, func = struct.unpack_from(
        "<iiqiiq", vread(addr + i * 32, 32)
    )
    s = rostr(ptr, s_size)
    print(f"{i:3d} {s!r} sub={sub_i} res={result} fn={func != 0}")
