"""Time the REFERENCE implementation's per-frame streaming inference on CPU.

Anchors bench.py's vs_baseline ratio honestly (BASELINE.md): the reference's
SGTADetector.run (lib/sgta_detector.py:117-236) is executed frame-by-frame on
a synthetic video, with the real torch model (conv decoder nodes — the DCNv2
CUDA extension does not exist on CPU), the real scipy peak decode, and the
real cv2 prior PnP — the full production per-frame path.

Usage:
    python scripts/bench_reference.py [--frames 12] [--res 480] [--json]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--res", type=int, default=480)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import torch

    # the reference's process() hardcodes cuda.synchronize (sgta_detector.py
    # :884) and _peaks_info hardcodes .cuda() (lib/model/utils.py:270); on
    # the CPU build both must be no-ops for the timing run
    torch.cuda.synchronize = lambda *a, **k: None
    torch.Tensor.cuda = lambda self, *a, **k: self

    import ref_oracle

    SGTADetector = ref_oracle.ensure_ref_detector_importable()

    # synthetic video in the reference's NDDS-seq format
    from sgtapose_tpu.data.synthetic import write_synthetic_dataset

    tmp = tempfile.mkdtemp(prefix="refbench_")
    write_synthetic_dataset(tmp, n_videos=1, n_frames=args.frames, seed=0)
    vdir = os.path.join(tmp, "00000")
    frames = sorted(f[: -len("_color.png")] for f in os.listdir(vdir)
                    if f.endswith("_color.png"))

    # random-weight checkpoint for the real torch model (the timing is
    # weight-independent; conv nodes per the CPU constraint)
    opt = ref_oracle.make_detector_opt(input_res=args.res)
    from lib.model.model import create_model

    model = create_model(opt.arch, opt.heads, opt.head_conv, opt=opt)
    ckpt_path = os.path.join(tmp, "ref_random.pth")
    torch.save({"epoch": 20, "state_dict": model.state_dict()}, ckpt_path)
    opt.load_model = ckpt_path

    from sgtapose_tpu.config import KEYPOINT_NAMES

    kp_names = list(KEYPOINT_NAMES["panda_synthetic"])
    detector = SGTADetector(opt, kp_names, is_real=False, is_ct=True)

    import cv2

    if len(frames) <= args.warmup:
        raise SystemExit(
            f"--frames ({len(frames)}) must exceed --warmup ({args.warmup}) "
            "or the mean would be over an empty set"
        )
    times = []
    torch.set_num_threads(os.cpu_count() or 8)
    with torch.no_grad():
        for j, fname in enumerate(frames):
            img = cv2.imread(os.path.join(vdir, fname + "_color.png"))
            json_path = os.path.join(vdir, fname + "_meta.json")
            t0 = time.perf_counter()
            detector.run(img, j, json_path, is_final=True)
            dt = time.perf_counter() - t0
            if j >= args.warmup:
                times.append(dt)
            print(f"frame {j}: {dt*1000:.1f} ms", file=sys.stderr)

    per_frame = float(np.mean(times))
    out = {
        "metric": "reference_cpu_fps",
        "value": round(1.0 / per_frame, 3),
        "unit": "frames/s",
        "per_frame_ms": round(per_frame * 1000, 2),
        "frames": len(times),
        "res": args.res,
        "torch_threads": torch.get_num_threads(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
