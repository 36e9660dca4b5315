#!/usr/bin/env python
"""Compress Snowball objdump output into readable pseudo-ops.

Usage: simplify.py file.asm [names.json]
Keeps: labels (jump targets), eq_s/eq_s_b with decoded strings,
find_among* with table address, slice ops, len_utf8 compares, cursor
loads/stores, I[] accesses, byte peeks, jumps.
"""
import json
import re
import sys

SO = "/usr/lib/postgresql/15/lib/dict_snowball.so"
data = open(SO, "rb").read()


def rostr(addr, size):
    return data[addr : addr + size].decode("utf-8", "replace")


lines = []
for line in open(sys.argv[1]):
    m = re.match(r"\s+([0-9a-f]+):\t[0-9a-f \t]+\t(.*)", line)
    if m:
        lines.append((int(m.group(1), 16), m.group(2).strip()))

names = {}
if len(sys.argv) > 2:
    names = {int(k, 16): v for k, v in json.load(open(sys.argv[2])).items()}

# find all jump targets
targets = set()
for a, ins in lines:
    m = re.search(r"\b(j\w+|call)\s+([0-9a-f]+)", ins)
    if m and m.group(1) != "call":
        targets.add(int(m.group(2), 16))

rdx_str = None
esi_val = None
rsi_among = None
edx_n = None
out = []
for a, ins in lines:
    pre = f"L{a:x}:" if a in targets else "      "
    m = re.match(r"lea\s+0x[0-9a-f]+\(%rip\),%r(dx|si|12|13|14|15|8|9|10|11|bx|cx|di|ax|bp)\s+#\s*([0-9a-f]+)", ins)
    if m:
        addr = int(m.group(2), 16)
        if m.group(1) == "dx":
            rdx_str = addr
            out.append(f"{pre} rdx={rostr(addr,12)!r}")
        else:
            rsi_among = addr
        continue
    m = re.match(r"mov\s+\$0x([0-9a-f]+),%esi", ins)
    if m:
        esi_val = int(m.group(1), 16)
        continue
    m = re.match(r"mov\s+\$0x([0-9a-f]+),%edx", ins)
    if m:
        edx_n = int(m.group(1), 16)
        continue
    if re.match(r"xor\s+%esi,%esi", ins):
        esi_val = 0
        continue
    if ins.startswith("call"):
        if "eq_s_b" in ins:
            s = rostr(rdx_str, esi_val) if rdx_str else "?"
            out.append(f"{pre} eq_s_b {s!r}")
        elif "eq_s" in ins:
            s = rostr(rdx_str, esi_val) if rdx_str else "?"
            out.append(f"{pre} eq_s {s!r}")
        elif "slice_from" in ins:
            s = rostr(rdx_str, esi_val) if rdx_str is not None and esi_val else ""
            out.append(f"{pre} slice_from {s!r}")
        elif "slice_del" in ins:
            out.append(f"{pre} slice_del")
        elif "find_among_b" in ins:
            nm = names.get(rsi_among, hex(rsi_among) if rsi_among else "?")
            out.append(f"{pre} find_among_b {nm} n={edx_n}")
        elif "find_among" in ins:
            nm = names.get(rsi_among, hex(rsi_among) if rsi_among else "?")
            out.append(f"{pre} find_among {nm} n={edx_n}")
        elif "len_utf8" in ins:
            out.append(f"{pre} len_utf8")
        elif "skip_b_utf8" in ins:
            out.append(f"{pre} skip_b 1char")
        elif "skip_utf8" in ins:
            out.append(f"{pre} skip 1char")
        elif "in_grouping_b" in ins:
            out.append(f"{pre} in_grouping_b")
        elif "out_grouping_b" in ins:
            out.append(f"{pre} out_grouping_b")
        elif "in_grouping" in ins:
            out.append(f"{pre} in_grouping")
        elif "out_grouping" in ins:
            out.append(f"{pre} out_grouping")
        else:
            m2 = re.match(r"call\s+([0-9a-f]+)", ins)
            if m2 and int(m2.group(1), 16) in names:
                out.append(f"{pre} CALL {names[int(m2.group(1),16)]}")
            else:
                out.append(f"{pre} {ins}")
        continue
    m = re.match(r"(j\w+)\s+([0-9a-f]+)", ins)
    if m:
        out.append(f"{pre} {m.group(1)} L{m.group(2)}")
        continue
    # env field ops
    sub = ins
    sub = sub.replace("0x8(%rbx)", "c").replace("0xc(%rbx)", "limit")
    sub = sub.replace("0x10(%rbx)", "lb").replace("0x14(%rbx)", "bra").replace("0x18(%rbx)", "ket")
    sub = sub.replace("0x8(%r12)", "c").replace("0xc(%r12)", "limit")
    sub = sub.replace("0x10(%r12)", "lb").replace("0x14(%r12)", "bra").replace("0x18(%r12)", "ket")
    sub = sub.replace("0x8(%r14)", "c").replace("0xc(%r14)", "limit").replace("0x14(%r14)", "bra").replace("0x18(%r14)", "ket").replace("0x10(%r14)", "lb")
    if re.match(r"(add|sub|neg)\b", ins):
        out.append(f"{pre} {sub}")
        continue
    if re.match(r"(mov|cmp|lea|test|cmpl|movl)\b", ins) and ("(%r" in sub or "%e" in sub or "%r" in sub):
        if any(k in sub for k in ("c", "limit", "lb", "bra", "ket", "(%rax)", "(%rdx)", "cmp", "test", "0x28", "cmpb", "movzbl", "lea")):
            out.append(f"{pre} {sub}")
        continue
    if ins == "ret":
        out.append(f"{pre} RET")

print("\n".join(out))
