#!/usr/bin/env python
"""Map a Snowball switch jump table to actions by tracing objdump text.

Usage: switchmap.py <asmfile> <jumptable_hex> <ncases>

For each case target, follows the straight-line block (and up to 6
unconditional jmp hops) recording: last lea->%rdx rodata addr, last
mov $N,%esi, flag checks (cmpl $0x0,0x4(%rax)), region compares, and
the terminating call (slice_from_s / slice_del / other).
"""
import re
import struct
import sys

SO = "/usr/lib/postgresql/15/lib/dict_snowball.so"
data = open(SO, "rb").read()


def rostr(addr, size):
    return data[addr : addr + size].decode("utf-8", "replace")


asm = {}
order = []
for line in open(sys.argv[1]):
    m = re.match(r"\s+([0-9a-f]+):\t[0-9a-f \t]+\t(.*)", line)
    if m:
        a = int(m.group(1), 16)
        asm[a] = m.group(2).strip()
        order.append(a)
idx = {a: i for i, a in enumerate(order)}

base = int(sys.argv[2], 16)
n = int(sys.argv[3])
vals = struct.unpack(f"<{n}i", data[base : base + 4 * n])
targets = [base + v for v in vals]


def trace(addr):
    notes = []
    rdx = None
    esi = None
    hops = 0
    i = idx.get(addr)
    if i is None:
        return f"?? {hex(addr)} not in asm"
    while i < len(order) and hops < 40:
        a = order[i]
        ins = asm[a]
        m = re.match(r"lea\s+0x[0-9a-f]+\(%rip\),%rdx\s+#\s*([0-9a-f]+)", ins)
        if m:
            rdx = int(m.group(1), 16)
        m = re.match(r"mov\s+\$0x([0-9a-f]+),%esi", ins)
        if m:
            esi = int(m.group(1), 16)
        if re.match(r"xor\s+%esi,%esi", ins):
            esi = 0
        if re.match(r"xor\s+%edx,%edx", ins):
            rdx = "NULL"
        if "cmpl" in ins and ("0x4(%rax)" in ins or "0x4(%rdx)" in ins):
            notes.append("FLAG?")
        m = re.match(r"cmp\s+(\(%rdx\)|0x4\(%rdx\)|0x8\(%rdx\)|\(%rax\)|0x4\(%rax\)|0x8\(%rax\)),", ins)
        if m:
            notes.append(f"CMP{m.group(1)}")
        if ins.startswith("call"):
            if "slice_from_s" in ins:
                s = rostr(rdx, esi) if isinstance(rdx, int) else ""
                return f"<- {s!r} {notes}"
            if "slice_del" in ins:
                return f"DEL {notes}"
            if "find_among_b" in ins or "find_among" in ins:
                notes.append("AMONG")
            elif "eq_s_b" in ins:
                s = rostr(rdx, esi) if isinstance(rdx, int) else "?"
                notes.append(f"EQ_B {s!r}")
            elif "eq_s" in ins:
                s = rostr(rdx, esi) if isinstance(rdx, int) else "?"
                notes.append(f"EQ {s!r}")
            else:
                notes.append(ins.split("<")[-1].rstrip(">"))
        m = re.match(r"jmp\s+([0-9a-f]+)", ins)
        if m:
            t = int(m.group(1), 16)
            if t not in idx:
                return f"jmp-out {hex(t)} {notes}"
            i = idx[t]
            hops += 1
            continue
        m = re.match(r"(ja|je|jne|jl|jle|jg|jge|js|jns)\s+([0-9a-f]+)", ins)
        if m:
            notes.append(f"{m.group(1)}->{m.group(2)}")
        if ins == "ret":
            return f"RET {notes}"
        i += 1
    return f"... {notes}"


for c, t in enumerate(targets):
    print(f"case {c}: @{hex(t)} {trace(t)}")
