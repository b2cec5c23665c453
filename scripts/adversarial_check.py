#!/usr/bin/env python3
"""Adversarial engine-vs-oracle sweep (driver-side tool, like oracle_check).

Builds a fixture deliberately nastier than the driver testdata — trailing/
leading non-space whitespace, empty and whitespace-only docs, CJK/accents/
emoji (surrogate pairs), huge single tokens, exact duplicates, repeated
paragraph windows, cosine TIES (duplicate vectors), zero/tiny/huge-magnitude
embeddings — then runs graft.Verify on it and compares every query against
its DuckDB twin. This is the sweep that caught the UTF-16-vs-code-point and
split-artifact divergences in round 6; keep it green.

Usage:
  python3 scripts/adversarial_check.py [workdir]
  # workdir defaults to /tmp/sfadv; Verify output goes to <workdir>_out
"""
import random
import shutil
import subprocess
import sys
from pathlib import Path

import duckdb

BASE = "/root/testdata/sf0.001"  # donor for the non-text tables


def build_fixture(dest: Path) -> None:
    dest.mkdir(parents=True, exist_ok=True)
    for p in Path(BASE).glob("*.parquet"):
        shutil.copy(p, dest / p.name)
    con = duckdb.connect()

    rows = []

    def add(i, text, lang="en", source=None):
        rows.append((i, text, lang, source or f"src{i % 20}", len(text)))

    base = "the fast key order sort table scan merge part filter group"
    add(0, base + "\n")                 # trailing newline (split artifact)
    add(1, "\t" + base)                 # leading tab
    add(2, "")                          # empty
    add(3, "   ")                       # only spaces
    add(4, "\n\t \n")                   # only mixed whitespace
    add(5, base)                        # clean twin of 0/1
    add(6, base)                        # exact duplicate of 5
    add(7, "word")
    add(8, "a")
    add(9, "数据 处理 引擎 分布式 计算 数据 处理", "zh")
    add(10, "café naïve résumé café naïve", "fr")
    add(11, "🚀 emoji 🚀 emoji 🚀")     # surrogate pairs
    add(12, "x" * 500)                  # one huge token
    add(13, ("tok " * 30).strip())
    para = " ".join(f"w{j}" for j in range(40))
    add(14, para + " " + para)          # repeated paragraph windows
    add(15, para)                       # containment pair with 14
    add(16, "user16@example.com from 10.0.0.1 contact")
    add(17, "a  b   c    d")
    add(18, "line1\nline2\nline1\nline2")
    add(19, "quote \"comma, comma\" 'single'")
    # BPE merge-frequency TIES: 'ab' and 'ba' pairs occur equally often, so
    # the learner's deterministic tie-break (count desc, pair asc) must
    # agree cross-engine or the learned table forks
    add(120, "abab baba abab baba abba baab")
    add(121, "the a of and to is the a of and to is")   # stopword-only
    add(122, "el la de que y los el la de que")         # es marker tokens
    add(123, "de le shi wo zai you de le shi")          # langid overlap set
    add(124, "join hash scan join hash scan join")      # BM25/CMS probe terms
    add(125, "user125@example.com 10.0.0.255 u@v.w 1.2.3.4 end")  # PII-dense
    add(126, "x" * 63 + " " + "y" * 65)                 # frame-boundary tokens
    add(127, "🚀" * 70)                                 # emoji-only long doc
    # genuine multilingual paragraphs — the script-range langid arm must
    # agree cross-engine on real CJK/Cyrillic/Arabic/Indic text (UTF-16
    # units vs code points; BMP-only ranges are the parity invariant)
    add(128, "数据处理引擎是分布式计算系统的核心组件之一", "zh")
    add(129, "これはテストです データのエンジンをしらべます", "ja")
    add(130, "이것은 데이터 처리 엔진의 테스트입니다", "ko")
    add(131, "это тестовый документ для обработки данных", "ru")
    add(132, "هذا اختبار لمحرك معالجة البيانات الموزعة", "ar")
    add(133, "यह डेटा प्रोसेसिंग इंजन का परीक्षण है", "hi")
    add(134, "นี่คือการทดสอบเอกสารสำหรับข้อมูล", "th")
    add(135, "αυτό είναι ένα δοκιμαστικό έγγραφο", "el")
    add(136, "the engine 处理 data 数据 mixed script", "en")  # mixed-script doc
    random.seed(7)
    vocab = ["spark", "scan", "merge", "join", "filter", "group", "sort",
             "data", "query", "row", "table", "key", "hash", "part", "order",
             "fast", "slow", "small", "large", "cache"]
    for i in range(20, 120):  # ids 120-127 are the targeted edge docs above
        n = random.randint(3, 60)
        add(i, " ".join(random.choice(vocab) for _ in range(n)),
            random.choice(["en", "fr", "de", "es", "zh"]))
    # Deliberate exclusion: \x0B (vertical tab) is whitespace to Java's \s
    # (the kernels) but NOT to DuckDB's RE2 \s — the one documented
    # oracle-parity precondition (NativeKernels.isWs note). Enforce it here
    # so the fixture never quietly blames the engine for RE2's dialect.
    assert all("\x0b" not in r[1] for r in rows), \
        "\\x0B is outside the oracle contract (RE2 \\s excludes it)"
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR, lang VARCHAR,"
                " source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO docs VALUES (?,?,?,?,?)", rows)
    con.sql(f"COPY docs TO '{dest}/documents.parquet' (FORMAT PARQUET)")

    dim = len(duckdb.sql(
        f"SELECT embedding FROM '{BASE}/embeddings.parquet' LIMIT 1").fetchone()[0])
    erows = []
    random.seed(11)

    def vec():
        return [random.uniform(-1, 1) for _ in range(dim)]

    v0 = vec()
    erows.append((0, v0, 0))
    erows.append((1, v0[:], 1))                       # duplicate -> cosine ties
    erows.append((2, [x * 3.0 for x in v0], 2))       # parallel, longer
    erows.append((3, [0.0] * dim, 3))                 # zero vector
    erows.append((4, [-x for x in v0], 4))            # antiparallel
    erows.append((5, [1e-6 * x for x in vec()], 0))   # tiny magnitude
    erows.append((6, [100.0 * x for x in vec()], 1))  # huge magnitude
    for i in range(7, 100):
        erows.append((i, vec(), i % 10))
    con.execute("CREATE TABLE emb(vec_id BIGINT, embedding FLOAT[], label INT)")
    con.executemany("INSERT INTO emb VALUES (?,?,?)", erows)
    con.sql(f"COPY emb TO '{dest}/embeddings.parquet' (FORMAT PARQUET)")


def main() -> int:
    work = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfadv")
    out = Path(str(work) + "_out")
    # stale outputs from a previous sweep would be compared as if current
    # (a thrown query leaves its OLD parquet behind) — always start clean
    if out.exists():
        shutil.rmtree(out)
    build_fixture(work)
    print(f"fixture at {work}; running graft.Verify ...", flush=True)
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {work} {out}"],
        cwd=Path(__file__).resolve().parent.parent, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-3000:])
        return 1
    check = subprocess.run(
        [sys.executable, str(Path(__file__).with_name("oracle_check.py")),
         str(work), str(out)])
    return check.returncode


if __name__ == "__main__":
    sys.exit(main())
