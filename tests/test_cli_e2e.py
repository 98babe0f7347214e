"""End-to-end CLI test: synthetic dataset on disk -> train -> checkpoint ->
infer -> metrics artifacts (the BASELINE 'syn_test single video, CPU-runnable'
slice)."""

import json
import os

import numpy as np
import pytest

from sgtapose_tpu.data.synthetic import write_synthetic_dataset

COMMON = [
    "--robot", "panda_synthetic",
    "--input_res", "64",
    "--dla_node", "conv",
    "--kernel_list", "3,3,3,1,1,1",
]


@pytest.mark.slow
def test_train_then_infer(tmp_path):
    train_dir = str(tmp_path / "train_data")
    out_dir = str(tmp_path / "exp")
    res_dir = str(tmp_path / "results")
    write_synthetic_dataset(train_dir, n_videos=2, n_frames=3, seed=0)

    from sgtapose_tpu.cli import train as train_cli

    train_cli.main(
        [
            "--dataset", train_dir,
            "--output_dir", out_dir,
            "--num_epochs", "1",
            "--batch_size", "2",
            "--num_devices", "1",
            "--log_every", "1",
        ]
        + COMMON
    )
    ckpt = os.path.join(out_dir, "ckpt", "epoch_1")
    assert os.path.isdir(ckpt)
    assert os.path.exists(os.path.join(out_dir, "metrics.jsonl"))
    # training mosaics appear (input | GT hm | pred hm; ref trainer mosaic log)
    viz = os.path.join(out_dir, "viz")
    assert os.path.isdir(viz) and any(f.endswith(".png") for f in os.listdir(viz))

    from sgtapose_tpu.cli import infer as infer_cli

    results = infer_cli.main(
        [
            "--dataset", train_dir,
            "--ckpt", ckpt,
            "--output_dir", res_dir,
            "--rf",
            "--multi_frame", "2",
            "--track",
        ]
        + COMMON
    )
    km = results["keypoint_metrics"]
    pm = results["pnp_metrics"]
    assert km["num_gt_inframe"] > 0
    assert pm["num_pnp_possible"] > 0
    # the --multi_frame flag produces real numbers + artifacts (both the
    # sliding-window and random-combination estimators)
    assert results["multiframe_pnp_metrics"]["num_pnp_possible"] > 0
    assert results["multiframe_pnp_real_metrics"]["num_pnp_possible"] > 0
    assert os.path.exists(os.path.join(res_dir, "syn_2_pnp_results.csv"))
    assert os.path.exists(os.path.join(res_dir, "syn_2_real_pnp_results.csv"))
    # artifacts written
    for f in ["syn_keypoints.csv", "syn_pnp_results.csv", "syn_analysis_results.txt", "dt_and_gt.json"]:
        assert os.path.exists(os.path.join(res_dir, f)), f
    with open(os.path.join(res_dir, "dt_and_gt.json")) as fh:
        blob = json.load(fh)
    assert len(blob["names"]) == 6  # 2 videos x 3 frames
    # --track writes the per-video association artifact (tracker pass,
    # ref sgta_detector.py:198-202)
    with open(os.path.join(res_dir, "tracks.json")) as fh:
        tracks = json.load(fh)
    assert len(tracks) == 2
    for ids in tracks.values():
        assert len(ids) == 3 and len(ids[0]) == 7


@pytest.mark.slow
def test_infer_quant_int8(tmp_path):
    """--quant int8 runs the streaming detector with quantized convs
    (models/layers.py serving mode) end-to-end from the CLI."""
    data_dir = str(tmp_path / "syn")
    res_dir = str(tmp_path / "q_results")
    write_synthetic_dataset(data_dir, n_videos=1, n_frames=2, seed=0)

    from sgtapose_tpu.cli import infer as infer_cli

    results = infer_cli.main(
        ["--dataset", data_dir, "--output_dir", res_dir, "--quant", "int8"]
        + COMMON
    )
    assert results["keypoint_metrics"]["num_gt_inframe"] > 0
    assert os.path.exists(os.path.join(res_dir, "syn_analysis_results.txt"))

    # static calibrated scales + channel gate (the fast serving form)
    res_dir2 = str(tmp_path / "qs_results")
    results = infer_cli.main(
        [
            "--dataset", data_dir, "--output_dir", res_dir2,
            "--quant", "int8", "--quant_static", "--quant_min_ch", "64",
        ]
        + COMMON
    )
    assert results["keypoint_metrics"]["num_gt_inframe"] > 0


@pytest.mark.slow
def test_train_non_default_phase_with_validation(tmp_path):
    """Regression: eval_step used to hardcode phase PlanA_win, so
    `--phase CenterNet --val_dataset X` crashed (wrong input arity) at the
    first validation pass."""
    train_dir = str(tmp_path / "train_data")
    val_dir = str(tmp_path / "val_data")
    out_dir = str(tmp_path / "exp")
    write_synthetic_dataset(train_dir, n_videos=1, n_frames=3, seed=0)
    write_synthetic_dataset(val_dir, n_videos=1, n_frames=3, seed=1)

    from sgtapose_tpu.cli import train as train_cli

    train_cli.main(
        [
            "--dataset", train_dir,
            "--val_dataset", val_dir,
            "--output_dir", out_dir,
            "--phase", "CenterNet",
            "--arch", "centernet",
            "--num_epochs", "1",
            "--batch_size", "2",
            "--num_devices", "1",
            "--log_every", "1",
        ]
        + COMMON
    )
    assert os.path.isdir(os.path.join(out_dir, "ckpt", "epoch_1"))
    # val metrics got logged, including the per-epoch keypoint suite
    # (ref train.py:44-166 save_results)
    with open(os.path.join(out_dir, "metrics.jsonl")) as fh:
        lines = [json.loads(l) for l in fh]
    val = [l for l in lines if l.get("prefix") == "val"]
    assert val and "kp_pck_auc_12px" in val[-1] and "kp_found_inframe" in val[-1]


@pytest.mark.slow
def test_infer_real_mode(tmp_path):
    """DREAM-real-format inference path (split info + camera settings +
    objects-format jsons)."""
    from sgtapose_tpu.data.synthetic import write_real_dataset

    data_dir = str(tmp_path / "real_data")
    res_dir = str(tmp_path / "real_results")
    write_real_dataset(data_dir, set_name="panda-test", n_videos=1, n_frames=3)

    from sgtapose_tpu.cli import infer as infer_cli

    results = infer_cli.main(
        [
            "--dataset", data_dir,
            "--is_real", "panda-test",
            "--output_dir", res_dir,
            "--robot", "panda",
            "--input_res", "64",
            "--dla_node", "conv",
            "--kernel_list", "3,3,3,1,1,1",
            "--debug", "1",
        ]
    )
    assert results["keypoint_metrics"]["num_gt_inframe"] > 0
    assert os.path.exists(os.path.join(res_dir, "dt_and_json_panda-test.json"))
    assert os.path.exists(os.path.join(res_dir, "panda-test_pnp_results.csv"))
    # --debug writes the per-frame Debugger artifacts (generic overlay +
    # pred_hm / pre_hm blends; ref sgta_detector.py debug path)
    dbg = os.listdir(os.path.join(res_dir, "debug"))
    assert any(f.endswith("_generic.png") for f in dbg)
    assert any(f.endswith("_pred_hm.png") for f in dbg)
    assert any(f.endswith("_pre_hm.png") for f in dbg)


@pytest.mark.slow
def test_infer_dream_mode(tmp_path):
    """--is_ct false: the DREAM-baseline single-frame path is reachable from
    the CLI (ref sgta_detector.py:50-52, model.py:31-41)."""
    data_dir = str(tmp_path / "syn")
    res_dir = str(tmp_path / "dream_results")
    write_synthetic_dataset(data_dir, n_videos=1, n_frames=2, seed=0)

    from sgtapose_tpu.cli import infer as infer_cli

    results = infer_cli.main(
        [
            "--dataset", data_dir,
            "--output_dir", res_dir,
            "--is_ct", "false",
            "--arch", "dreamhourglass",
            "--robot", "panda_synthetic",
            "--input_res", "64",
        ]
    )
    assert results["keypoint_metrics"]["num_gt_inframe"] > 0
    assert os.path.exists(os.path.join(res_dir, "syn_analysis_results.txt"))

    # flip-TTA variant of the same path (ref _flip_output average_flips rule;
    # working equivalent of the reference's broken --flip_test — PARITY.md)
    results_flip = infer_cli.main(
        [
            "--dataset", data_dir,
            "--output_dir", str(tmp_path / "dream_results_flip"),
            "--is_ct", "false",
            "--arch", "dreamhourglass",
            "--robot", "panda_synthetic",
            "--input_res", "64",
            "--flip_test",
        ]
    )
    assert results_flip["keypoint_metrics"]["num_gt_inframe"] > 0

    # the temporal detector rejects the flag with the documented explanation
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="DREAM single-frame"):
        infer_cli.main(
            [
                "--dataset", data_dir,
                "--output_dir", str(tmp_path / "rejected"),
                "--flip_test",
            ]
        )


@pytest.mark.slow
def test_train_then_infer_global_attention_arch(tmp_path):
    """The dlapa (DLA_PlanA global-attention) arch trains one epoch and runs
    streaming inference via --phase PlanA — each zoo arch must decode
    end-to-end, not just forward (VERDICT round-1 item 4)."""
    train_dir = str(tmp_path / "train_data")
    out_dir = str(tmp_path / "exp")
    res_dir = str(tmp_path / "results")
    write_synthetic_dataset(train_dir, n_videos=1, n_frames=3, seed=0)

    from sgtapose_tpu.cli import infer as infer_cli
    from sgtapose_tpu.cli import train as train_cli

    arch_args = ["--arch", "dlapa_34", "--phase", "PlanA"]
    train_cli.main(
        [
            "--dataset", train_dir,
            "--output_dir", out_dir,
            "--num_epochs", "1",
            "--batch_size", "2",
            "--num_devices", "1",
            "--log_every", "1",
        ]
        + COMMON + arch_args
    )
    ckpt = os.path.join(out_dir, "ckpt", "epoch_1")
    assert os.path.isdir(ckpt)
    results = infer_cli.main(
        [
            "--dataset", train_dir,
            "--ckpt", ckpt,
            "--output_dir", res_dir,
        ]
        + COMMON + arch_args
    )
    assert results["keypoint_metrics"]["num_gt_inframe"] > 0


@pytest.mark.slow
def test_train_three_frame_phase(tmp_path):
    """--phase PlanA_three trains the 3-frame arch end-to-end from the CLI
    (triple discovery + TripleBatchLoader + make_batch_fn_three)."""
    train_dir = str(tmp_path / "train_data")
    out_dir = str(tmp_path / "exp")
    write_synthetic_dataset(train_dir, n_videos=1, n_frames=4, seed=0)

    from sgtapose_tpu.cli import train as train_cli

    train_cli.main(
        [
            "--dataset", train_dir,
            "--output_dir", out_dir,
            "--phase", "PlanA_three",
            "--arch", "dlapawd3_34",
            "--num_epochs", "1",
            "--batch_size", "2",
            "--num_devices", "1",
            "--log_every", "1",
        ]
        + COMMON
    )
    assert os.path.isdir(os.path.join(out_dir, "ckpt", "epoch_1"))


@pytest.mark.slow
def test_train_depth_mode(tmp_path):
    """--depth training: 42-joint flat-directory dataset end-to-end
    (ref CenterTrackSeqDepthDataset, datasets.py:445-635)."""
    from sgtapose_tpu.data.synthetic import write_depth_dataset

    data_dir = str(tmp_path / "depth")
    out_dir = str(tmp_path / "exp")
    write_depth_dataset(data_dir, set_name="panda-depth", n_frames=4)

    from sgtapose_tpu.cli import train as train_cli

    train_cli.main(
        [
            "--dataset", os.path.join(data_dir, "panda-depth"),
            "--output_dir", out_dir,
            "--depth",
            "--num_epochs", "1",
            "--batch_size", "2",
            "--num_devices", "1",
            "--log_every", "1",
            "--input_res", "64",
            "--dla_node", "conv",
            "--kernel_list", "3,3,3,1,1,1",
        ]
    )
    assert os.path.isdir(os.path.join(out_dir, "ckpt", "epoch_1"))


@pytest.mark.slow
def test_infer_depth_mode(tmp_path):
    """--depth: the 42-joint depth-variant path end-to-end
    (ref inference.py:407-522 + the ours_42 analysis)."""
    from sgtapose_tpu.data.synthetic import write_depth_dataset

    data_dir = str(tmp_path / "depth")
    res_dir = str(tmp_path / "depth_results")
    write_depth_dataset(data_dir, set_name="panda-depth", n_frames=3)

    from sgtapose_tpu.cli import infer as infer_cli

    results = infer_cli.main(
        [
            "--dataset", data_dir,
            "--is_real", "panda-depth",
            "--depth",
            "--output_dir", res_dir,
            "--input_res", "64",
            "--dla_node", "conv",
            "--kernel_list", "3,3,3,1,1,1",
        ]
    )
    # 3 frames x 42 joints of GT
    assert results["keypoint_metrics"]["num_gt_inframe"] + \
        results["keypoint_metrics"]["num_gt_outframe"] == 3 * 42
    assert os.path.exists(
        os.path.join(res_dir, "panda-depth_42_pnp_results.csv")
    )
    assert os.path.exists(
        os.path.join(res_dir, "dt_and_json_panda-depth_42.json")
    )


@pytest.mark.slow
def test_infer_real_mode_mixed_resolutions(tmp_path):
    """A real split whose videos have different raw resolutions: the runner
    must be rebuilt per resolution (no silent miswarp with the first video's
    transform) and the metrics must bucket each frame against its own frame
    size (VERDICT r2 weak item 6)."""
    from PIL import Image

    from sgtapose_tpu.data.synthetic import write_real_dataset

    data_dir = str(tmp_path / "real_data")
    res_dir = str(tmp_path / "real_results")
    write_real_dataset(data_dir, set_name="panda-mixed", n_videos=2, n_frames=2)

    # upscale video 1's frames to a different resolution (scale projections
    # in its jsons to stay geometrically consistent pixel-wise)
    set_dir = os.path.join(data_dir, "panda-mixed")
    split_path = os.path.join(data_dir, "dream_real_info",
                              "panda-mixed_split_info.json")
    with open(split_path) as fh:
        split = json.load(fh)
    for img_rel, js_rel in zip(split["img_paths"][1], split["json_paths"][1]):
        p = os.path.join(set_dir, img_rel)
        im = Image.open(p)
        im.resize((im.width * 2, im.height * 2), Image.BILINEAR).save(p)
        jp = os.path.join(set_dir, js_rel)
        with open(jp) as fh:
            blob = json.load(fh)
        for kp in blob["objects"][0]["keypoints"]:
            kp["projected_location"] = [2 * v for v in kp["projected_location"]]
        with open(jp, "w") as fh:
            json.dump(blob, fh)

    from sgtapose_tpu.cli import infer as infer_cli

    results = infer_cli.main(
        [
            "--dataset", data_dir,
            "--is_real", "panda-mixed",
            "--output_dir", res_dir,
            "--robot", "panda",
            "--input_res", "64",
            "--dla_node", "conv",
            "--kernel_list", "3,3,3,1,1,1",
        ]
    )
    km = results["keypoint_metrics"]
    # all 7 GT keypoints of every frame are in their OWN frame: with a single
    # (last-video) resolution the 2x video's GT would be miscounted
    assert km["num_gt_inframe"] + km["num_gt_outframe"] == 4 * 7
    assert km["num_gt_inframe"] >= 24  # near-all in frame at both sizes


@pytest.mark.slow
def test_train_then_infer_kuka(tmp_path):
    """Multi-robot support end-to-end: the 9-keypoint kuka config trains and
    infers from the CLI (ref opts_parallel.py:439-475 get_keypoint_names)."""
    train_dir = str(tmp_path / "kuka_data")
    out_dir = str(tmp_path / "kuka_exp")
    res_dir = str(tmp_path / "kuka_results")
    write_synthetic_dataset(train_dir, n_videos=2, n_frames=3, seed=2,
                            robot_name="kuka")

    from sgtapose_tpu.cli import infer as infer_cli
    from sgtapose_tpu.cli import train as train_cli

    kuka_common = [
        "--robot", "kuka",
        "--input_res", "64",
        "--dla_node", "conv",
        "--kernel_list", "3,3,3,1,1,1",
    ]
    train_cli.main(
        [
            "--dataset", train_dir,
            "--output_dir", out_dir,
            "--num_epochs", "1",
            "--batch_size", "2",
            "--num_devices", "1",
            "--log_every", "1",
        ]
        + kuka_common
    )
    ckpt = os.path.join(out_dir, "ckpt", "epoch_1")
    assert os.path.isdir(ckpt)

    results = infer_cli.main(
        [
            "--dataset", train_dir,
            "--ckpt", ckpt,
            "--output_dir", res_dir,
        ]
        + kuka_common
    )
    km = results["keypoint_metrics"]
    # 2 videos x 3 frames x 9 keypoints accounted for
    assert km["num_gt_inframe"] + km["num_gt_outframe"] == 54
