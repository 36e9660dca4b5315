#!/usr/bin/env python
"""Extract golden Snowball stem vectors from PostgreSQL's compiled
``dict_snowball.so`` (the genuine Snowball stemmers, shipped with the
in-container postgres 15 — public PostgreSQL/Snowball BSD code).

This is the round-5 unblock for the 27 unported stemmer languages:
the snowballstem.org spec text is not available offline, but the
REFERENCE IMPLEMENTATION is — `ts_lexize('<lang>_stem', word)` gives
the exact expected output for any input, so ports can be developed
test-first against thousands of oracle-extracted vectors instead of
reconstructing suffix tables from memory (which CLAUDE.md rightly
forbids).

Usage:
    python scripts/snowball_oracle.py start         # init + start pg
    python scripts/snowball_oracle.py langs         # list dictionaries
    python scripts/snowball_oracle.py stem da hus huse husene
    python scripts/snowball_oracle.py extract da wordlist.txt out.tsv
    python scripts/snowball_oracle.py stop

The cluster lives under /tmp/pgsnow (unix socket only, no TCP), runs
as `nobody`, and is a dev-time tool — the pytest suite consumes the
extracted .tsv files and never needs postgres.
"""

from __future__ import annotations

import os
import subprocess
import sys

PG_BIN = "/usr/lib/postgresql/15/bin"
PG_DIR = "/tmp/pgsnow"
PG_DATA = os.path.join(PG_DIR, "data")
PG_PORT = "54311"


def _su(cmd: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["su", "nobody", "-s", "/bin/bash", "-c", cmd],
        capture_output=True, text=True, cwd="/tmp",
    )


def start() -> None:
    if not os.path.exists(PG_DATA):
        os.makedirs(PG_DIR, exist_ok=True)
        subprocess.run(["chown", "nobody", PG_DIR], check=True)
        r = _su(f"{PG_BIN}/initdb -D {PG_DATA} -E UTF8 --no-locale")
        if r.returncode:
            sys.exit(f"initdb failed:\n{r.stderr}")
    r = _su(
        f"{PG_BIN}/pg_ctl -D {PG_DATA} -l {PG_DIR}/log "
        f"-o '-k {PG_DIR} -p {PG_PORT} -c listen_addresses=' start"
    )
    print(r.stdout or r.stderr)


def stop() -> None:
    r = _su(f"{PG_BIN}/pg_ctl -D {PG_DATA} stop -m fast")
    print(r.stdout or r.stderr)


def _psql_json(sql: str) -> str:
    import tempfile

    with tempfile.NamedTemporaryFile(
        "w", suffix=".sql", dir=PG_DIR, delete=False, encoding="utf-8"
    ) as f:
        f.write(sql)
        path = f.name
    os.chmod(path, 0o644)
    try:
        r = _su(
            f"{PG_BIN}/psql -h {PG_DIR} -p {PG_PORT} -d postgres -At "
            f"-v ON_ERROR_STOP=1 -f {path}"
        )
    finally:
        os.unlink(path)
    if r.returncode:
        raise RuntimeError(r.stderr)
    return r.stdout


def stem_words(
    lang: str, words: list[str], nostop: bool = False
) -> list[str | None]:
    """Oracle stems for ``words`` (order-preserving; None = the
    dictionary dropped the token — for some languages postgres
    attaches a stopword list to ``<lang>_stem``). ``nostop=True``
    uses a stopword-free dictionary ``<lang>_ns`` (created on
    demand), so every word gets a real stem."""
    import json as _json
    import tempfile

    # ship words through a temp file to avoid any quoting pitfalls
    with tempfile.NamedTemporaryFile(
        "w", suffix=".json", dir=PG_DIR, delete=False
    ) as f:
        _json.dump(words, f, ensure_ascii=False)
        path = f.name
    os.chmod(path, 0o644)
    dname = lang + ("_ns" if nostop else "_stem")
    if nostop:
        try:
            _psql_json(
                f"CREATE TEXT SEARCH DICTIONARY {dname} "
                f"(TEMPLATE=snowball, language='{lang}')"
            )
        except RuntimeError as e:
            if "already exists" not in str(e):
                raise
    try:
        sql = (
            "SELECT COALESCE((ts_lexize('" + dname + "', w))[1], '')"
            " FROM (SELECT json_array_elements_text(pg_read_file("
            f"'{path}')::json) AS w) t"
        )
        out = _psql_json(sql)
    finally:
        os.unlink(path)
    lines = out.split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    assert len(lines) == len(words), (len(lines), len(words))
    return [x if x != "" else None for x in lines]


def extract(lang: str, wordlist: str, out_tsv: str) -> None:
    with open(wordlist, encoding="utf-8") as f:
        words = [w.strip() for w in f if w.strip()]
    stems = stem_words(lang, words)
    with open(out_tsv, "w", encoding="utf-8") as f:
        for w, s in zip(words, stems):
            if s is not None:
                f.write(f"{w}\t{s}\n")
    print(f"{out_tsv}: {len(words)} words")


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "help"
    if cmd == "start":
        start()
    elif cmd == "stop":
        stop()
    elif cmd == "langs":
        print(_psql_json(
            "SELECT dictname FROM pg_ts_dict WHERE dictname LIKE "
            "'%_stem' ORDER BY 1"
        ))
    elif cmd == "stem":
        lang, words = sys.argv[2], sys.argv[3:]
        for w, s in zip(words, stem_words(lang, words)):
            print(f"{w}\t{s}")
    elif cmd == "extract":
        extract(sys.argv[2], sys.argv[3], sys.argv[4])
    else:
        print(__doc__)


if __name__ == "__main__":
    main()
