#!/usr/bin/env python
"""Time full-file event digestion (ref: bin/decode_benchmark.rs)."""

import argparse
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

from adder_tpu.codec.decoder import open_file_decoder


def main():
    p = argparse.ArgumentParser(description="decode benchmark")
    p.add_argument("-i", "--input", required=True)
    args = p.parse_args()
    t0 = time.perf_counter()
    dec = open_file_decoder(args.input)
    events = dec.digest_all()
    dt = time.perf_counter() - t0
    print(
        f"digested {len(events)} events in {dt*1000:.1f} ms "
        f"({len(events)/max(dt,1e-9)/1e6:.1f} Mev/s)"
    )

from adder_tpu.codec.header import CodecError  # noqa: E402
if __name__ == "__main__":
    try:
        main()
    except CodecError as e:
        sys.exit(f"error: not a valid ADDER stream: {e}")
    except FileNotFoundError as e:
        sys.exit(f"error: {e}")
