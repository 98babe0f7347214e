"""END-TO-END streaming-detector parity against the LIVING reference.

Drives the reference's actual `SGTADetector.run` frame loop
(ref lib/sgta_detector.py:117-236: cv2 preprocess -> prior PnP via is_pnp ->
numpy prior rendering -> torch forward -> scipy peak decode -> inverse affine
-> per-frame keypoint feedback) and our `make_video_detector(ref_sort="y")`
scan over the SAME synthetic video with the SAME weights, and bounds the
per-frame detected-keypoint drift (VERDICT r2 item 1 — the last unproven
integration between "all components match" and "the system matches").

Getting a FUNCTIONAL detector cheaply on one CPU core: full training of the
torch reference here is ~6 s/step, so instead the fixture
  1. default-initializes the reference model (conv decoder nodes),
  2. calibrates its BatchNorm running stats on a small synthetic pool
     (eval-mode stats of (0,1) otherwise squash features to near-constants),
  3. caches POST-ATTENTION features (ref dla.py:1505-1546 front half) under
     both prior conditions (zero priors = frame 0; GT-noised priors = steady
     state) and trains the decoder (dla_up/ida_up) + hm/reg heads on the
     cache (~0.14 s/step vs 6 s full),
which yields sharp, unambiguous peaks (0.4-0.9) within ~2 px of GT for all 7
classes in BOTH prior conditions — a well-conditioned prior-PnP recurrence —
in ~4 minutes, cached on disk thereafter.

The trained state_dict is then converted with the production converter
(bgr_to_rgb=True: the reference consumes cv2 BGR frames, our loader RGB) and
both detectors run cold (zero priors at frame 0) over a 12-frame video.
"""

import os
import sys
import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sgtapose_tpu.config import (  # noqa: E402
    Config,
    InferConfig,
    ModelConfig,
    SYNTHETIC_CAMERA_K,
    TrainConfig,
)
from sgtapose_tpu.data import loaders, pipeline, synthetic  # noqa: E402
from sgtapose_tpu.infer import detector as det_lib  # noqa: E402
from sgtapose_tpu.models.sgta import SGTAPose  # noqa: E402
from sgtapose_tpu.utils import torch_convert as tc  # noqa: E402

import ref_oracle  # noqa: E402

RES = 192
CLS = RES // 4
KP_NAMES = ["Link0", "Link1", "Link3", "Link4", "Link6", "Link7", "Panda_hand"]
# BUMP the version suffix whenever anything that shapes the fixture's
# training data changes (the on-device pipeline feeding make_pool — e.g. the
# round-4 EPnP prior init changed the rendered priors and therefore the
# trained fixture), or a stale cache will mask the new fixture's behavior.
CKPT_CACHE = "/root/repo/.cache/detparity_ref%d_v5.pth" % RES
POOL_BATCHES = 16
POOL_BATCH = 4
# enough decoder training that every class's blob is sharp and unimodal on
# both videos: a weak flat blob (hm max ~0.4) puts peak EXISTENCE at the
# local-max/threshold boundary, where the ~1e-2 cross-framework forward
# drift (cv2-vs-jax warp interpolation through 30+ conv layers) flips which
# peaks exist and the y-sort selection rule then amplifies the flip to
# px-scale — observed at 3200 steps on 2/12 strict frames after the EPnP
# pipeline change retrained the fixture.
DECODER_STEPS = 4800

pytestmark = pytest.mark.slow


def _nchw(x):
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))


def _train_functional_reference():
    """Default-init reference model + BN calibration + decoder/head training
    on cached post-attention features. Returns the state_dict."""
    # two pools: light disturb (steady-state priors) and heavy disturb (the
    # detector's own mid-recurrence regime — priors off by several px with
    # drops and false positives; without this condition the fixture model
    # echoes its priors and the recurrence never stabilizes)
    raw_fn = jax.jit(lambda k: synthetic.make_raw_batch(k, POOL_BATCH))

    def make_pool(disturb, seed):
        cfg = Config(
            model=ModelConfig(input_res=(RES, RES), dla_node="conv"),
            train=TrainConfig(
                hm_disturb=disturb[0], lost_disturb=disturb[1],
                fp_disturb=disturb[2],
            ),
        )
        batch_fn = pipeline.make_batch_fn(cfg, synthetic.camera_K(), augment=False)
        out = []
        for i in range(POOL_BATCHES):
            k = jax.random.fold_in(jax.random.PRNGKey(seed), i)
            raw = raw_fn(jax.random.fold_in(k, 0))
            b = batch_fn(jax.random.fold_in(k, 1), raw)
            out.append({k2: np.asarray(v) for k2, v in b.items()})
        return out

    samples = make_pool((2.0, 0.15, 0.05), 1234)
    samples_noisy = make_pool((6.0, 0.35, 0.1), 4321)

    dla = ref_oracle.ref_dla_module()
    opt = ref_oracle.make_ref_opt()
    torch.manual_seed(3)
    model = dla.DLA_PlanAWindow_l3new(
        34, ref_oracle.HEADS, ref_oracle.HEAD_CONVS, opt
    )
    torch.set_num_threads(os.cpu_count() or 1)

    def prior_args(b, cond):
        if cond == "gt":
            return (_nchw(b["pre_img"][..., ::-1]),
                    _nchw(b["pre_hm"]), _nchw(b["repro_hm"]),
                    _nchw(b["pre_hm_cls"]), _nchw(b["repro_hm_cls"]))
        cur = _nchw(b["cur_img"][..., ::-1])
        z1 = torch.zeros(cur.shape[0], 1, RES, RES)
        z2 = torch.zeros(cur.shape[0], 7, CLS, CLS)
        # frame-0 semantics: previous image := current image, zero priors
        return (cur, z1, z1, z2, z2)

    def attention_feats(x, pre_img, pre_hm, repro_hm, pre_cls, repro_cls):
        """post-attention 6-level features (the front half of the reference's
        imgpre2feats, dla.py:1505-1546, via the reference's own functions)."""
        x_pre = model.base(pre_img=pre_img, pre_hm=pre_hm)
        x_cur = model.base(pre_img=x, pre_hm=repro_hm)
        x_out = []
        for i in range(len(x_cur)):
            pre_topk, repro_topk = dla.get_topk_index(
                pre_cls, repro_cls, model.K_list[i])
            pre_key, _, _ = dla.get_topk_features_scale(
                x_pre[i], pre_topk, scale_num=model.scale_list[i],
                kernel=model.kernel_list[i])
            cur_query, cur_bid, cur_fid = dla.get_topk_features_scale(
                x_cur[i], repro_topk, scale_num=model.scale_list[i],
                kernel=model.kernel_list[i])
            out = (model.transformer[i](cur_query, pre_key, pre_key)
                   if i <= 2 else pre_key)
            x_out.append(dla.substitute_topk_features_scale(
                out, x_cur[i], cur_bid, cur_fid, model.cat_layer[i]))
        return x_out

    def decoder_heads(feats):
        x = model.dla_up(list(feats))
        y = [x[i].clone() for i in range(model.last_level - model.first_level)]
        model.ida_up(y, 0, len(y))
        return model.hm(y[-1]), model.reg(y[-1])

    # BN calibration (train-mode running-stat updates; no optimizer)
    model.train()
    with torch.no_grad():
        for b in samples:
            cur = _nchw(b["cur_img"][..., ::-1])
            for cond in ("gt", "zero"):
                model.imgpre2feats(cur, *prior_args(b, cond))
    model.eval()

    # cache post-attention features: light-disturb priors, zero priors, and
    # heavy-disturb priors (three regimes of the streaming recurrence)
    F, GT, KPI, REGT = [], [], [], []
    with torch.no_grad():
        for pool, conds in ((samples, ("gt", "zero")), (samples_noisy, ("gt",))):
            for b in pool:
                cur = _nchw(b["cur_img"][..., ::-1])
                for cond in conds:
                    F.append([f.clone() for f in
                              attention_feats(cur, *prior_args(b, cond))])
                    GT.append(_nchw(b["gt_belief_maps"]))
                    KPI.append(torch.from_numpy(b["kp_int"].astype(np.int64)))
                    REGT.append(torch.from_numpy(b["reg_target"]))

    optim = torch.optim.Adam(
        list(model.dla_up.parameters()) + list(model.ida_up.parameters())
        + list(model.hm.parameters()) + list(model.reg.parameters()),
        lr=1e-3,
    )
    g = torch.Generator().manual_seed(7)
    sched = torch.optim.lr_scheduler.StepLR(optim, step_size=3200, gamma=0.3)
    for _ in range(DECODER_STEPS):
        idx = int(torch.randint(0, len(F), (1,), generator=g))
        out_hm, out_reg = decoder_heads(F[idx])
        hm = torch.clamp(torch.sigmoid(out_hm), 1e-4, 1 - 1e-4)
        l_hm = ((hm - GT[idx]) ** 2).mean()
        reg = out_reg.permute(0, 2, 3, 1)
        gathered = reg[torch.arange(reg.shape[0])[:, None],
                       KPI[idx][..., 1], KPI[idx][..., 0]]
        l_reg = torch.nn.functional.smooth_l1_loss(gathered, REGT[idx])
        loss = l_hm + 0.01 * l_reg
        optim.zero_grad()
        loss.backward()
        optim.step()
        sched.step()
    return model.state_dict()


@pytest.fixture(scope="module")
def functional_ckpt():
    if not os.path.exists(CKPT_CACHE):
        os.makedirs(os.path.dirname(CKPT_CACHE), exist_ok=True)
        sd = _train_functional_reference()
        torch.save({"epoch": 20, "state_dict": sd}, CKPT_CACHE)
    return CKPT_CACHE


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("detparity"))
    synthetic.write_synthetic_dataset(tmp, n_videos=1, n_frames=12, seed=11)
    return os.path.join(tmp, "00000")


@pytest.fixture(scope="module")
def video_dir_strict(tmp_path_factory):
    """Video where every keypoint projects WELL inside the raw frame on every
    frame (seed probed for >=10 px margins), so no prior class map is ever
    all-zero and the reference's behavior is fully well-defined (see the
    torch.topk tie-order note on test_teacher_forced_parity_strict)."""
    tmp = str(tmp_path_factory.mktemp("detparity_strict"))
    synthetic.write_synthetic_dataset(tmp, n_videos=1, n_frames=12, seed=18)
    return os.path.join(tmp, "00000")


def _run_reference_detector(ckpt_path, video_dir, teacher=None,
                            return_hms=False):
    """The reference's production per-frame loop, frame by frame.

    teacher: optional (T, K, 2) raw-coord detections; when given, frame j's
    prior PnP consumes teacher[j] instead of the detector's own previous
    output (the reference reads self.detected_kps at sgta_detector.py:171 —
    overridden before each run() call).
    return_hms: also return the per-frame sigmoided output heatmaps
    (T, C, Ho, Wo), captured from process() for the decode-stability
    classifier (see test_teacher_forced_parity_strict)."""
    import cv2

    torch.cuda.synchronize = lambda *a, **k: None  # ref hardcodes CUDA calls
    torch.Tensor.cuda = lambda self, *a, **k: self  # (sgta_detector.py:884,
    # lib/model/utils.py:270) — no-op shims for the CPU build
    SGTADetector = ref_oracle.ensure_ref_detector_importable()
    opt = ref_oracle.make_detector_opt(input_res=RES, load_model=ckpt_path)
    detector = SGTADetector(opt, KP_NAMES, is_real=False, is_ct=True)

    hms = []
    if return_hms:
        orig_process = detector.process

        def process_hook(*a, **k):
            out = orig_process(*a, **k)
            # output["hm"] is already sigmoid+clamped (ref _sigmoid_output)
            hms.append(out[0]["hm"].detach().cpu().numpy()[0])
            return out

        detector.process = process_hook

    frames = sorted(f[:-len("_color.png")] for f in os.listdir(video_dir)
                    if f.endswith("_color.png"))
    per_frame = []
    torch.set_num_threads(os.cpu_count() or 1)
    with torch.no_grad():
        for j, fname in enumerate(frames):
            img = cv2.imread(os.path.join(video_dir, fname + "_color.png"))
            json_path = os.path.join(video_dir, fname + "_meta.json")
            if teacher is not None:
                detector.detected_kps = np.array(teacher[j], np.float64)
            _, detected_kps, _ = detector.run(img, j, json_path, is_final=True)
            per_frame.append(np.array(detected_kps, np.float64))
    kps = np.stack(per_frame)  # (T, 7, 2) raw coords, sentinel -3999.996
    if return_hms:
        return kps, np.stack(hms)
    return kps


def _run_our_detector(ckpt_path, video_dir, teacher=None, return_hms=False):
    sd = torch.load(ckpt_path, map_location="cpu", weights_only=True)["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items()}

    cfg = Config(
        model=ModelConfig(input_res=(RES, RES), dla_node="conv"),
        infer=InferConfig(ref_sort="y"),
    )
    model = SGTAPose(cfg.model)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, RES, RES, 3)), jnp.zeros((1, RES, RES, 3)),
        jnp.zeros((1, RES, RES, 1)), jnp.zeros((1, RES, RES, 1)),
        jnp.zeros((1, CLS, CLS, 7)), jnp.zeros((1, CLS, CLS, 7)),
        train=False,
    )
    params, stats, report = tc.convert_state_dict(
        sd, variables["params"], variables["batch_stats"],
        bgr_to_rgb=True, strict=True, dla_node="conv",
    )
    assert not report["missing"] and not report["mismatched"]
    variables = {"params": params, "batch_stats": stats}

    def apply(variables, *inputs):
        return model.apply(variables, *inputs, train=False)

    frames = sorted(f[:-len("_color.png")] for f in os.listdir(video_dir)
                    if f.endswith("_color.png"))
    imgs = np.stack([
        loaders.load_image(os.path.join(video_dir, f + "_color.png"))
        for f in frames
    ])
    K = np.asarray(SYNTHETIC_CAMERA_K)
    x3d = np.stack([
        loaders.load_seq_keypoints(
            os.path.join(video_dir, f + "_meta.json"),
            "panda_synthetic", KP_NAMES, K,
        )["positions_wrt_robot"]
        for f in frames
    ])

    run = det_lib.make_video_detector(
        apply, variables, cfg, K, raw_hw=(synthetic.RAW_H, synthetic.RAW_W),
        debug_outputs=return_hms,
    )
    images, _, _ = det_lib.preprocess_frames(jnp.asarray(imgs, jnp.float32), cfg)
    res = run(det_lib.VideoFrames(
        images=images,
        x3d=jnp.asarray(x3d, jnp.float32),
        teacher_kps=(None if teacher is None
                     else jnp.asarray(teacher, jnp.float32)),
    ))
    kps = np.asarray(res.detected_kps, np.float64)  # (T, 7, 2)
    if return_hms:
        # (T, Ho, Wo, C) -> (T, C, Ho, Wo) to match the reference capture
        return kps, np.transpose(np.asarray(res.debug_hm), (0, 3, 1, 2))
    return kps


def _gt_projections(video_dir):
    frames = sorted(f[:-len("_color.png")] for f in os.listdir(video_dir)
                    if f.endswith("_color.png"))
    K = np.asarray(SYNTHETIC_CAMERA_K)
    gts = []
    for f in frames:
        kp = loaders.load_seq_keypoints(
            os.path.join(video_dir, f + "_meta.json"),
            "panda_synthetic", KP_NAMES, K,
        )
        p = kp["positions_wrt_cam"] @ K.T
        gts.append(p[:, :2] / p[:, 2:3])
    return np.stack(gts)


def _prior_divergence(video_dir, teacher):
    """Per-frame distance (raw px, mean over keypoints) between the
    reference's prior reprojection (geometric_vision.is_pnp — cv2
    EPnP+ITERATIVE inside solve_pnp) and ours
    (core.pnp.pnp_reprojection_prior — multi-init DLT+LM) on the SAME
    teacher detections. Computed directly on the prior inputs, independent
    of either model forward: frames where the two solvers land in different
    optima are the documented irreducible gap, and everything downstream of
    a diverged prior legitimately differs. Which frames diverge depends on
    the noise draw and on BLAS-level rounding, so the set is machine- and
    fixture-dependent — the classifier, not a pinned count, is the stable
    statement of parity."""
    from sgtapose_tpu.core import pnp as pnp_lib

    ref_oracle.ensure_ref_detector_importable()
    gv = sys.modules["sgtapose"].geometric_vision

    frames = sorted(f[:-len("_color.png")] for f in os.listdir(video_dir)
                    if f.endswith("_color.png"))
    K = np.asarray(SYNTHETIC_CAMERA_K)
    x3d = np.stack([
        loaders.load_seq_keypoints(
            os.path.join(video_dir, f + "_meta.json"),
            "panda_synthetic", KP_NAMES, K,
        )["positions_wrt_robot"]
        for f in frames
    ])
    T = teacher.shape[0]
    div = np.zeros(T)
    for t in range(1, T):
        valid = np.all(teacher[t] > det_lib.KP_SENTINEL + 1e-6, axis=1)
        if valid.sum() < 4:
            continue
        _, ref_est = gv.is_pnp(
            np.asarray(x3d[t - 1], np.float64)[valid],
            np.asarray(teacher[t], np.float64)[valid],
            np.asarray(x3d[t], np.float64),
            np.asarray(teacher[t], np.float64),
            np.asarray(K, np.float64),
        )
        ok, our_est, _ = pnp_lib.pnp_reprojection_prior(
            jnp.asarray(x3d[t - 1], jnp.float32),
            jnp.asarray(teacher[t], jnp.float32),
            jnp.asarray(x3d[t], jnp.float32),
            jnp.asarray(K, jnp.float32),
            jnp.asarray(valid),
        )
        # both sides fall back to the teacher detections on PnP failure
        # (is_pnp returns prev_kp_projs_all; the detector reuses prior_kps)
        our = np.where(bool(ok), np.asarray(our_est, np.float64), teacher[t])
        div[t] = float(np.mean(np.linalg.norm(our - np.asarray(ref_est), axis=1)))
    return div


def _decode_stability(ref_hms, our_hms):
    """Per-frame decode-stability classifier (same pattern as
    _prior_divergence: measure the REFERENCE's own sensitivity, don't pin
    frames). The two implementations' output heatmaps agree to ~1.5e-2
    everywhere (cv2-vs-jax warp interpolation through 30+ conv layers —
    asserted separately); the one discrete hazard left is the peak rule:
    when a class's blob is weak/flat, an epsilon value difference flips
    which local maxima EXIST, and the reference's y-sort selection
    (lib/model/utils.py:214-263) then lands on a different peak entirely.

    Classifier: run the reference's OWN decode (_ref_peaks_select — real
    scipy peaks_from_belief_maps + the y-sort/ambiguity rule) on BOTH
    heatmaps. A frame is decode-stable iff that decode maps the two
    epsilon-equal inputs to the same selection (same sentinel mask, same
    peak to <0.5 output cell) for every class. On unstable frames the
    reference's own CPU/CUDA builds would disagree with each other too, so
    exact coordinate parity is not well-defined there; it IS asserted on
    every stable frame.

    The 0.5-cell "same selection" radius separates two measured regimes:
    genuine same-peak centroid drift under epsilon-equal inputs is <=0.03
    cells (gaussian-weighted averaging moves continuously), while a
    peak-membership flip in a weak cold-start blob measures ~0.7 cells
    (observed on a retrained fixture's frame 0, class 6: the reference rule
    itself mapped the two heatmaps — max |dev| 0.03 — to selections 0.69
    cells apart). An earlier 1.0-cell radius misclassified that flip as
    stable and the exactness assert then compared across different peaks.

    Returns (stable (T,) bool, hm_dev (T,) max |ref-our| heatmap deviation).
    """
    from test_parity_solvers import _ref_peaks_select

    T = ref_hms.shape[0]
    stable = np.ones(T, bool)
    hm_dev = np.zeros(T)
    for t in range(T):
        hm_dev[t] = float(np.max(np.abs(ref_hms[t] - our_hms[t])))
        ca, _, _ = _ref_peaks_select(np.ascontiguousarray(ref_hms[t]))
        cb, _, _ = _ref_peaks_select(np.ascontiguousarray(our_hms[t]))
        va = np.all(ca > -999.0, axis=1)
        vb = np.all(cb > -999.0, axis=1)
        if np.any(va != vb):
            stable[t] = False
            continue
        d = np.linalg.norm(ca[va] - cb[va], axis=1)
        if d.size and float(d.max()) >= 0.5:
            stable[t] = False
    return stable, hm_dev


def _make_teacher(video_dir, seed=13, noise_px=2.0, dropout=True):
    """Plausible 'previous-frame detections' per frame: GT projections of
    frame t-1 + seeded noise, frame 0 all-sentinel (cold start -> zero priors
    on both sides). dropout=True additionally drops one class per frame
    (rotating) — which makes that class's prior map all-zero and puts the
    reference into its implementation-defined torch.topk tie-order regime
    (see test_teacher_forced_parity_strict)."""
    gts = _gt_projections(video_dir)
    T, K, _ = gts.shape
    rng = np.random.RandomState(seed)
    teacher = np.full((T, K, 2), det_lib.KP_SENTINEL)
    for t in range(1, T):
        teacher[t] = gts[t - 1] + rng.randn(K, 2) * noise_px
        if dropout:
            teacher[t, (t - 1) % K] = det_lib.KP_SENTINEL  # rotating dropout
    return teacher


def _compare_runs(ref_kps, our_kps):
    """Per-frame (mean, max) drift over jointly-detected keypoints + mask
    mismatch count."""
    T = ref_kps.shape[0]
    sent = det_lib.KP_SENTINEL
    per_frame = []
    n_both = n_mask_mismatch = 0
    for t in range(T):
        rv = np.all(ref_kps[t] > sent + 1e-6, axis=1)
        ov = np.all(our_kps[t] > sent + 1e-6, axis=1)
        n_mask_mismatch += int(np.sum(rv != ov))
        both = rv & ov
        n_both += int(both.sum())
        d = (np.linalg.norm(ref_kps[t][both] - our_kps[t][both], axis=1)
             if both.any() else np.array([0.0]))
        per_frame.append((t, float(np.mean(d)), float(np.max(d))))
    return per_frame, n_both, n_mask_mismatch


def test_teacher_forced_parity_strict(functional_ckpt, video_dir_strict):
    """Per-frame parity of the FULL pipeline (prior PnP -> prior rendering ->
    Siamese forward -> decode -> inverse affine) with both implementations fed
    the SAME prior detections each frame. Teacher forcing removes the chaotic
    closed-loop feedback (where any epsilon implementation difference — or
    even a different BLAS — diverges on a weak model), so this bounds the
    actual implementation gap frame-by-frame, every frame independently.

    This is the STRICT variant: the video keeps every keypoint >=10 px inside
    the raw frame and the teacher never drops a class, so no prior class map
    is ever all-zero and the reference's behavior is fully well-defined.
    (When a class's prior map IS all-zero, the reference's get_topk_index —
    dla.py:898-913 — runs torch.topk on all-equal values, whose tie order is
    implementation-defined: torch CPU returns heap order (8,10,4,15,... for
    K=16), CUDA radix sort returns something else again, and our lax.top_k
    returns ascending indices. The window-attention keys then differ between
    the reference's OWN backends, let alone vs ours — debugged empirically:
    all four prior tensors match to 2e-6 on drift frames while detections
    drift px-scale. That regime is exercised by
    test_teacher_forced_dropout_bounded instead.)

    Since round 4 the prior-PnP init IS the reference's (masked EPnP,
    core/pnp.py:epnp_init — measured <0.01 px full-solve divergence vs cv2
    EPnP+ITERATIVE over 198 random poses), so the former per-frame
    solver-basin exemption is gone: the two solvers' prior reprojections
    must agree to <0.3 raw px on EVERY frame (asserted directly via
    _prior_divergence).

    What parity means here, in three unconditional + one classified claim:
      (1) prior solvers agree <0.3 raw px, every frame;
      (2) the FULL pipeline's output heatmaps agree to <0.05 absolute
          (measured ~1.5e-2), every frame, every class, every pixel;
      (3) most frames match at exact coordinate grade (<0.3 raw px mean);
      (4) the few remaining frames are exactly those _decode_stability
          classifies as epsilon-unstable under the reference's OWN peak
          rule (where its CPU and CUDA builds would disagree with each
          other too), and even there drift stays bounded."""
    teacher = _make_teacher(video_dir_strict, dropout=False)
    ref_kps, ref_hms = _run_reference_detector(
        functional_ckpt, video_dir_strict, teacher, return_hms=True)
    our_kps, our_hms = _run_our_detector(
        functional_ckpt, video_dir_strict, teacher, return_hms=True)
    prior_div = _prior_divergence(video_dir_strict, teacher)
    T = ref_kps.shape[0]
    assert our_kps.shape == ref_kps.shape

    per_frame, n_both, n_mask_mismatch = _compare_runs(ref_kps, our_kps)
    stable, hm_dev = _decode_stability(ref_hms, our_hms)
    print("\nstrict per-frame (frame, mean px, max px):", per_frame)
    print("prior-PnP solver divergence (raw px):",
          [round(float(d), 3) for d in prior_div])
    print("decode-stable frames:", stable.tolist())
    print("heatmap deviation per frame:", np.round(hm_dev, 4).tolist())
    print(f"joint detections {n_both}/{T * 7}, mask mismatches {n_mask_mismatch}")

    assert n_both >= T * 4, f"too few joint detections: {n_both}"
    means = np.array([m for _, m, _ in per_frame])
    # (1) the prior solvers themselves agree on every frame (no exemptions)
    assert prior_div.max() < 0.3, prior_div.tolist()
    # (2) full-pipeline heatmap parity, every frame (measured ~1.5e-2)
    assert hm_dev.max() < 0.05, hm_dev.tolist()
    # (3) every decode-stable frame matches at exact grade, and nearly all
    #     frames are stable
    assert int(stable.sum()) >= T - 3, stable.tolist()
    bad = [(t, means[t]) for t in range(T) if stable[t] and means[t] >= 0.3]
    assert not bad, (bad, per_frame)
    # (4) unstable frames (the reference's own peak rule is epsilon-sensitive
    #     there) stay bounded — a different peak of the same blob structure
    assert means.max() < 40.0, per_frame


def test_teacher_forced_dropout_bounded(functional_ckpt, video_dir):
    """Teacher forcing WITH rotating per-frame class dropout: the dropped
    class's prior map is all-zero, which puts the reference into its
    implementation-defined torch.topk tie-order regime (see the strict test's
    docstring — the reference's CPU and CUDA builds diverge from EACH OTHER
    here). Exact parity is therefore not well-defined on such frames; this
    test bounds the behavior instead: detectors stay live, detection masks
    mostly agree, and drift stays bounded while most frames still match at
    exact grade in practice."""
    teacher = _make_teacher(video_dir)
    ref_kps, ref_hms = _run_reference_detector(
        functional_ckpt, video_dir, teacher, return_hms=True)
    our_kps, our_hms = _run_our_detector(
        functional_ckpt, video_dir, teacher, return_hms=True)
    T = ref_kps.shape[0]
    assert our_kps.shape == ref_kps.shape

    per_frame, n_both, n_mask_mismatch = _compare_runs(ref_kps, our_kps)
    stable, hm_dev = _decode_stability(ref_hms, our_hms)
    prior_div = _prior_divergence(video_dir, teacher)
    print("\ndropout per-frame (frame, mean px, max px):", per_frame)
    print("decode-stable frames:", stable.tolist())
    print("prior-PnP solver divergence (raw px):",
          [round(float(d), 3) for d in prior_div])
    print(f"joint detections {n_both}/{T * 7}, mask mismatches {n_mask_mismatch}")

    assert n_both >= T * 4, f"too few joint detections: {n_both}"
    # mask flips are score-threshold sensitivity (ambiguity-gap comparisons
    # right at 0.25 / weak peaks at peak_thresh flip on 1e-4 heatmap noise
    # while the agreed positions match to <0.2 px); measured 13-16/84
    assert n_mask_mismatch <= 2 * T, (n_mask_mismatch, per_frame)
    # heatmap-level parity holds on every frame whose prior BOTH solvers
    # agree on (<0.3 raw px, the strict test's bound). A dropped-class
    # frame's 6-point + 2px-noise prior fit can land the two solvers in
    # different optima (measured: one frame at 2.56 px divergence, ours the
    # slightly LOWER-residual optimum vs GT) — everything downstream of a
    # diverged prior input legitimately differs, so those frames get the
    # sigmoid-level bound instead. Solver agreement stays the norm.
    agreed = prior_div < 0.3
    assert int(agreed.sum()) >= T - 2, prior_div.tolist()
    dis = [(t, float(hm_dev[t])) for t in range(T) if agreed[t]
           and hm_dev[t] >= 0.05]
    assert not dis, (dis, hm_dev.tolist())
    assert hm_dev.max() < 1.0, hm_dev.tolist()
    means = np.array([m for _, m, _ in per_frame])
    # frame 0: zero priors, pure preprocess+forward+decode parity — exact
    # when the reference's own peak rule is stable at this input
    if stable[0]:
        assert per_frame[0][1] < 0.3, per_frame
    # a solid fraction of frames still match at exact grade (tie-order
    # divergence only manifests when the trained weights are sensitive to
    # the affected class — measured 8/12 exact, but in the worst case every
    # dropped-class frame plus a basin flip could drift, so this bound is
    # deliberately loose; exactness is owned by the strict test)
    assert int(np.sum(means < 0.3)) >= T // 3, per_frame
    assert means.max() < 40.0, per_frame


def test_free_running_drift_diagnostic(functional_ckpt, video_dir):
    """Closed-loop (production) run on both sides. With a fixture-grade model
    the closed loop is not contractive, so per-frame agreement is chaotic and
    NOT a meaningful implementation bound (see teacher-forced test above for
    that); this records the drift curve and asserts sanity: frame-0 parity is
    exact-grade and both implementations keep detecting throughout."""
    ref_kps, ref_hms = _run_reference_detector(
        functional_ckpt, video_dir, return_hms=True)
    our_kps, our_hms = _run_our_detector(
        functional_ckpt, video_dir, return_hms=True)
    T = ref_kps.shape[0]
    sent = det_lib.KP_SENTINEL
    drift, ref_n, our_n = [], 0, 0
    for t in range(T):
        rv = np.all(ref_kps[t] > sent + 1e-6, axis=1)
        ov = np.all(our_kps[t] > sent + 1e-6, axis=1)
        ref_n += int(rv.sum())
        our_n += int(ov.sum())
        both = rv & ov
        d = (np.linalg.norm(ref_kps[t][both] - our_kps[t][both], axis=1)
             if both.any() else [])
        drift.append((t, [round(float(x), 2) for x in d]))
    print("\nfree-running drift (frame, |ref-ours| px):", drift)

    # frame 0 (zero priors, no feedback yet): heatmap parity always; exact
    # coordinate parity when the reference's own peak rule is stable here
    stable0, hm_dev0 = _decode_stability(ref_hms[:1], our_hms[:1])
    assert hm_dev0[0] < 0.05, hm_dev0
    rv0 = np.all(ref_kps[0] > sent + 1e-6, axis=1)
    ov0 = np.all(our_kps[0] > sent + 1e-6, axis=1)
    both0 = rv0 & ov0
    assert both0.sum() >= 3
    if stable0[0]:
        d0 = np.linalg.norm(ref_kps[0][both0] - our_kps[0][both0], axis=1)
        assert d0.max() < 0.3, d0
    # liveness: both sides keep detecting across the video
    assert ref_n >= T * 3 and our_n >= T * 3, (ref_n, our_n)

def test_reference_flip_test_is_broken():
    """The reference's --flip_test flag is NON-FUNCTIONAL on its detector:
    pre_process never doubles the image batch (sgta_detector.py:368-399 emits
    batch 1 unconditionally — the CenterTrack-lineage image-doubling was
    dropped in this fork), so _flip_output (sgta_detector.py:864-877)
    averages output[0:1] with flip(output[1:2]) where [1:2] is EMPTY; torch
    broadcasting silently yields an EMPTY (0,...) heatmap, killing every
    downstream decode. This test pins that evidence; our working flip-TTA
    equivalent lives on the DREAM single-frame mode
    (infer/dream_detector.py flip_test) where the augmentation is
    well-defined. PARITY.md documents the justified drop."""
    torch = pytest.importorskip("torch")
    SGTADetector = ref_oracle.ensure_ref_detector_importable()

    out = {"hm": torch.rand(1, 7, 8, 8)}  # batch 1, as process() produces
    res = SGTADetector._flip_output(None, out)
    assert res["hm"].shape[0] == 0  # empty — no detection can ever decode


def test_dream_flip_tta_average_semantics():
    """Our DREAM-mode flip TTA implements exactly the reference's
    average_flips rule for 'hm' (lib/model/utils.py:35-36 flip_tensor +
    sgta_detector.py:870-871): sigmoid both passes, un-mirror the flipped
    pass, average, then decode. Verified end-to-end against a hand-computed
    average on an orientation-sensitive stub model (a fixed x-gradient bias
    breaks mirror equivariance, so TTA must CHANGE the scores)."""
    import jax
    import jax.numpy as jnp

    from sgtapose_tpu.config import Config, ModelConfig
    from sgtapose_tpu.data import image_space
    from sgtapose_tpu.decode import peaks as decode_lib
    from sgtapose_tpu.infer.dream_detector import make_dream_detector

    H = W = 64
    Ho = Wo = H // 4
    xbias = jnp.linspace(0.0, 2.0, Wo)[None, None, :]

    def stub_apply(variables, images):
        x = images[:, ::4, ::4, 0]  # normalized red channel, (B, Ho, Wo)
        logits = 6.0 * x + xbias
        return {"hm": jnp.repeat(logits[..., None], 7, axis=-1)}

    cfg = Config(model=ModelConfig(input_res=(H, W)))
    run_flip = make_dream_detector(stub_apply, {}, cfg, (W, H), flip_test=True)
    run_plain = make_dream_detector(stub_apply, {}, cfg, (W, H))

    # two frames, one bright square each at asymmetric positions
    imgs = np.zeros((2, H, W, 3), np.uint8)
    imgs[0, 16:24, 40:48] = 255
    imgs[1, 36:44, 12:20] = 255

    kps_flip, scores_flip = run_flip(imgs)
    kps_plain, scores_plain = run_plain(imgs)

    # hand-compute the expected averaged map (identical preprocessing)
    from PIL import Image

    from sgtapose_tpu.config import IMAGE_MEAN, IMAGE_STD

    mean = np.asarray(IMAGE_MEAN, np.float32)
    std = np.asarray(IMAGE_STD, np.float32)
    netin = np.stack([
        (np.asarray(
            image_space.preprocess_image(Image.fromarray(im), (W, H),
                                         "shrink-and-crop"),
            np.float32) / 255.0 - mean) / std
        for im in imgs
    ])
    s = lambda v: np.clip(1.0 / (1.0 + np.exp(-v)), 1e-4, 1 - 1e-4)
    hm_a = s(np.asarray(stub_apply({}, jnp.asarray(netin))["hm"]))
    hm_b = s(np.asarray(stub_apply({}, jnp.asarray(netin[:, :, ::-1, :]))["hm"]))
    expected = (hm_a + hm_b[:, :, ::-1, :]) / 2.0

    def decode(hm):
        zeros = jnp.zeros((Ho, Wo, 2), jnp.float32)
        dec = jax.vmap(
            lambda h: decode_lib.decode_heatmaps(
                jnp.asarray(h), zeros, zeros,
                max_peaks=cfg.infer.max_peaks,
                peak_thresh=cfg.infer.peak_thresh,
                ambiguity_gap=cfg.infer.ambiguity_gap,
                peak_offset=cfg.infer.peak_offset,
                sigma=cfg.infer.peak_sigma,
                use_reg=False,
                ref_sort=cfg.infer.ref_sort,
            )
        )(jnp.asarray(hm))
        return np.asarray(dec.coords), np.asarray(dec.scores)

    exp_coords, exp_scores = decode(expected)

    # expected netout coords -> raw coords (same conversion the runner does)
    found = exp_coords[..., 0] > -999.0
    netin_pts = image_space.convert_keypoints_to_netin_from_netout(
        exp_coords.reshape(-1, 2), (Wo, Ho), (W, H)
    )
    raw_pts = image_space.convert_keypoints_to_raw_from_netin(
        netin_pts, (W, H), (W, H), "shrink-and-crop"
    ).reshape(exp_coords.shape)
    raw_pts[~found] = -999.999 * 4

    found_flip = np.asarray(kps_flip)[..., 0] > -999.0
    assert found.any()  # the blobs decode
    np.testing.assert_array_equal(found, found_flip)
    np.testing.assert_allclose(
        np.asarray(kps_flip)[found], raw_pts[found], atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(scores_flip)[found], exp_scores[found], atol=1e-4
    )
    # the x-gradient bias is not mirror-equivariant, so TTA must change the
    # scores vs the plain pass (the flag is not a silent no-op)
    assert not np.allclose(scores_flip[found],
                           np.asarray(scores_plain)[found], atol=1e-4)
