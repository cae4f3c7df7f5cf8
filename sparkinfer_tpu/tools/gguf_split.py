"""GGUF shard/merge (ref: tools/gguf-split, 583 LoC).

Split a GGUF into N-tensor shards (`model-00001-of-0000N.gguf` naming,
`split.no/split.count/split.tensors.count` KVs like the reference) and
merge shards back into one file. The loader side can read merged output;
shard-aware loading reads each shard's tensors independently.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from ..gguf.reader import GGUFReader
from ..gguf.writer import GGUFWriter

SPLIT_NO = "split.no"
SPLIT_COUNT = "split.count"
SPLIT_TENSORS = "split.tensors.count"


def _shard_name(base: str, i: int, n: int) -> str:
    stem = base[:-5] if base.endswith(".gguf") else base
    return f"{stem}-{i + 1:05d}-of-{n:05d}.gguf"


def split_file(src: str, out_base: str, max_tensors: int = 128) -> list[str]:
    r = GGUFReader(src)
    arch = r.arch()
    names = list(r.tensors)
    n_shards = max(1, (len(names) + max_tensors - 1) // max_tensors)
    outs = []
    for i in range(n_shards):
        shard_names = names[i * max_tensors : (i + 1) * max_tensors]
        path = _shard_name(out_base, i, n_shards)
        w = GGUFWriter(path, arch)
        if i == 0:  # metadata rides the first shard (ref behavior)
            for k, v in r.kv.items():
                if k == "general.architecture":
                    continue
                try:
                    w.add_kv(k, v)
                except Exception:
                    w.add_array(k, v)
        w.add_kv(SPLIT_NO, np.uint16(i))
        w.add_kv(SPLIT_COUNT, np.uint16(n_shards))
        w.add_kv(SPLIT_TENSORS, np.int32(len(names)))
        for name in shard_names:
            t = r.tensors[name]
            w.add_tensor(name, t.raw(), t.ggml_type, raw=True, ne=t.ne)
        w.write()
        outs.append(path)
    r.close()
    return outs


def merge_files(first_shard: str, dst: str) -> int:
    r0 = GGUFReader(first_shard)
    n_shards = int(r0.kv.get(SPLIT_COUNT, 1))
    arch = r0.arch()
    w = GGUFWriter(dst, arch)
    for k, v in r0.kv.items():
        if k in (SPLIT_NO, SPLIT_COUNT, SPLIT_TENSORS, "general.architecture"):
            continue
        try:
            w.add_kv(k, v)
        except Exception:
            w.add_array(k, v)
    n = 0
    readers = [r0]
    p = Path(first_shard)
    import re

    m = re.match(r"(.*)-(\d{5})-of-(\d{5})\.gguf$", p.name)
    if not m:
        raise ValueError(f"{first_shard}: not a shard name")
    for i in range(1, n_shards):
        readers.append(GGUFReader(p.parent / f"{m.group(1)}-{i + 1:05d}-of-{n_shards:05d}.gguf"))
    for r in readers:
        for name, t in r.tensors.items():
            w.add_tensor(name, t.raw(), t.ggml_type, raw=True, ne=t.ne)
            n += 1
    w.write()
    for r in readers:
        r.close()
    return n


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="sparkinfer-gguf-split")
    ap.add_argument("mode", choices=["split", "merge"])
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--max-tensors", type=int, default=128)
    args = ap.parse_args(argv)
    if args.mode == "split":
        outs = split_file(args.src, args.dst, args.max_tensors)
        print("\n".join(outs))
    else:
        n = merge_files(args.src, args.dst)
        print(f"merged {n} tensors -> {args.dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
