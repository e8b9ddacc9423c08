"""Promote the raw 1080p accumulation to the gate golden.

Replaces goldens/vwvan_1080p.exr with vwvan_1080p_raw.exr, removes the
.PROXY marker (bench then stops reporting the proxy flag/bound), and
records the raw render's spp + noise-floor PSNR ceiling in
goldens/vwvan_1080p.json. Refuses below --min-spp (default 2048: the
~47 dB ceiling that beats the proxy's measured 42.4 dB).
"""
import argparse
import json
import os
import shutil

G = "/root/repo/goldens"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-spp", type=int, default=2048)
    args = ap.parse_args()

    with open(os.path.join(G, "vwvan_1080p_raw.json")) as f:
        meta = json.load(f)
    assert meta["spp"] >= args.min_spp, (
        f"raw golden has {meta['spp']} spp < {args.min_spp}; render more "
        "(scripts/make_1080p_golden_raw.py) or pass --min-spp"
    )
    shutil.copyfile(os.path.join(G, "vwvan_1080p_raw.exr"),
                    os.path.join(G, "vwvan_1080p.exr"))
    proxy = os.path.join(G, "vwvan_1080p.PROXY")
    if os.path.exists(proxy):
        os.remove(proxy)
    # per-pixel sigma ~0.20/sqrt(spp) -> tonemapped-RMSE noise floor
    import math

    sigma = 0.20 / math.sqrt(meta["spp"])
    ceiling_db = 10.0 * math.log10(1.0 / max(sigma * sigma, 1e-12))
    with open(os.path.join(G, "vwvan_1080p.json"), "w") as f:
        json.dump(dict(kind="raw-unbiased", spp=meta["spp"],
                       noise_psnr_ceiling_db=round(ceiling_db, 1),
                       source="scripts/make_1080p_golden_raw.py"), f,
                  indent=1)
    print(f"promoted: {meta['spp']} spp, ceiling ~{ceiling_db:.1f} dB")


if __name__ == "__main__":
    main()
