"""CLI integration for the asset-pipeline entry points, REFERENCE flags.

render / test_render / preprocess_blendvoca / optimize_blendshape_coeffs
driven end-to-end on tiny synthetic meshes, exercising the reference's
own flag spellings (``--blendshapes_out_dir``, ``--neutral_dir``,
``--repeat_regex``, ``--show_difference``/``--save_images``,
``--blendshapes_coeffs_out_dir`` — script/render.py,
script/test_render.py:26-67, script/preprocess_blendvoca.py:40-48,
script/optimize_blendshape_coeffs.py) so reference command lines
translate 1:1.
"""

import os
import pickle

import numpy as np
import pytest

from said_tpu.data.blendvoca import BLENDSHAPE_CLASSES, PERSON_IDS_TEST
from said_tpu.utils.blendshape import load_blendshape_coeffs, save_blendshape_coeffs
from said_tpu.utils.mesh import create_mesh, save_mesh

N_VERTS = 9


def _face_mesh(jitter: float = 0.0, seed: int = 0):
    """A small, front-facing 3x3 vertex grid (renders to visible pixels)."""
    g = np.linspace(-0.06, 0.06, 3)
    xx, yy = np.meshgrid(g, g)
    verts = np.stack([xx.ravel(), yy.ravel(), np.zeros(N_VERTS)], axis=1)
    if jitter:
        verts = verts + jitter * np.random.default_rng(seed).standard_normal(
            verts.shape
        )
    faces = []
    for r in range(2):
        for c in range(2):
            i = 3 * r + c
            faces.append([i, i + 1, i + 3])
            faces.append([i + 1, i + 4, i + 3])
    return create_mesh(verts.astype(np.float64), np.asarray(faces))


@pytest.fixture(scope="module")
def blendshape_assets(tmp_path_factory):
    """neutral obj + 32 blendshape objs + a 6-frame coeffs CSV."""
    root = tmp_path_factory.mktemp("bl_assets")
    neutral = _face_mesh()
    save_mesh(neutral, str(root / "neutral.obj"))
    bl_dir = root / "blendshapes"
    bl_dir.mkdir()
    rng = np.random.default_rng(1)
    for name in BLENDSHAPE_CLASSES:
        delta = 0.01 * rng.standard_normal((N_VERTS, 3))
        save_mesh(create_mesh(neutral.vertices + delta, neutral.faces),
                  str(bl_dir / f"{name}.obj"))
    coeffs = rng.uniform(0, 1, (6, 32)).astype(np.float32)
    save_blendshape_coeffs(coeffs, BLENDSHAPE_CLASSES, str(root / "coeffs.csv"))
    return root


def test_render_cli_reference_flags(blendshape_assets, tmp_path):
    from said_tpu.cli.render import main

    root = blendshape_assets
    out_avi = str(tmp_path / "out.avi")
    img_dir = str(tmp_path / "imgs")
    main([
        "--neutral_path", str(root / "neutral.obj"),
        "--blendshapes_dir", str(root / "blendshapes"),
        "--blendshape_coeffs_path", str(root / "coeffs.csv"),
        "--blendshape_list_path", "/nonexistent",
        "--audio_path", "/nonexistent.wav",
        "--output_path", out_avi,
        "--show_difference", "True",
        "--target_diff_blendshape_coeffs_path", str(root / "coeffs.csv"),
        "--save_images", "True",
        "--output_images_dir", img_dir,
        "--width", "64", "--height", "64",
    ])
    assert os.path.getsize(out_avi) > 0
    pngs = sorted(os.listdir(img_dir))
    assert len(pngs) == 6 and "0.png" in pngs


def test_test_render_cli_repeat_regex(blendshape_assets, tmp_path):
    from said_tpu.cli.test_render import main

    root = blendshape_assets
    pid = PERSON_IDS_TEST[0]
    neutrals = tmp_path / "templates_head"
    blshapes = tmp_path / "blendshapes_head" / pid
    coeffs_dir = tmp_path / "coeffs" / pid
    neutrals.mkdir()
    blshapes.parent.mkdir()
    os.symlink(str(root / "blendshapes"), str(blshapes))
    os.symlink(str(root / "neutral.obj"), str(neutrals / f"{pid}.obj"))
    coeffs_dir.mkdir(parents=True)
    src = load_blendshape_coeffs(str(root / "coeffs.csv"))
    for fname in ("sentence01.csv", "sentence01-1.csv"):
        save_blendshape_coeffs(src, BLENDSHAPE_CLASSES, str(coeffs_dir / fname))

    common = [
        "--audio_dir", str(tmp_path / "no_audio"),
        "--coeffs_dir", str(tmp_path / "coeffs"),
        "--neutral_dir", str(neutrals),  # the reference's flag spelling
        "--blendshapes_dir", str(tmp_path / "blendshapes_head"),
        "--blendshape_list_path", "/nonexistent",
    ]
    out_all = tmp_path / "out_all"
    main(common + ["--output_dir", str(out_all)])
    assert sorted(os.listdir(out_all / pid)) == [
        "sentence01-1.avi", "sentence01.avi",
    ]
    # repeat_regex "" keeps only the un-suffixed file (reference
    # test_render.sh renders repeats one index at a time)
    out_first = tmp_path / "out_first"
    main(common + ["--output_dir", str(out_first), "--repeat_regex", ""])
    assert sorted(os.listdir(out_first / pid)) == ["sentence01.avi"]


def test_preprocess_cli_reference_flags(tmp_path):
    from said_tpu.cli.preprocess_blendvoca import main

    pid = PERSON_IDS_TEST[0]
    templates = tmp_path / "templates"
    templates.mkdir()
    full = _face_mesh()
    save_mesh(full, str(templates / f"{pid}.ply"))
    head_idx = list(range(N_VERTS))[:6]  # crop to the first 6 vertices
    head_idx_path = tmp_path / "head_idx.txt"
    head_idx_path.write_text("".join(f"{i}\n" for i in head_idx))
    deltas = {
        pid: {
            name: 0.01 * np.ones((len(head_idx), 3))
            for name in BLENDSHAPE_CLASSES
        }
    }
    deltas_path = tmp_path / "residuals.pickle"
    with open(deltas_path, "wb") as f:
        pickle.dump(deltas, f)

    out = tmp_path / "BlendVOCA"
    main([
        "--templates_dir", str(templates),
        "--blendshape_residuals_path", str(deltas_path),  # reference name
        "--head_idx_path", str(head_idx_path),
        "--blendshapes_out_dir", str(out),  # reference one-dir layout
    ])
    assert (out / "templates_head" / f"{pid}.obj").exists()
    produced = sorted(os.listdir(out / "blendshapes_head" / pid))
    assert produced == sorted(f"{n}.obj" for n in BLENDSHAPE_CLASSES)


def test_optimize_cli_reference_out_flag(blendshape_assets, tmp_path):
    from said_tpu.cli.optimize_blendshape_coeffs import main
    from said_tpu.utils.mesh import load_mesh

    root = blendshape_assets
    pid = PERSON_IDS_TEST[0]
    neutrals = tmp_path / "templates_head"
    blshapes = tmp_path / "blendshapes_head"
    neutrals.mkdir(); blshapes.mkdir()
    os.symlink(str(root / "neutral.obj"), str(neutrals / f"{pid}.obj"))
    os.symlink(str(root / "blendshapes"), str(blshapes / pid))

    # a 3-frame mesh sequence: neutral deformed by known coefficients
    neutral = load_mesh(str(root / "neutral.obj"))
    matrix = np.stack(
        [
            load_mesh(str(root / "blendshapes" / f"{n}.obj")).vertices.reshape(-1)
            - neutral.vertices.reshape(-1)
            for n in BLENDSHAPE_CLASSES
        ],
        axis=1,
    )
    gt = np.asarray([np.full(32, 0.2), np.full(32, 0.25), np.full(32, 0.3)])
    seq_dir = tmp_path / "seqs" / pid / "sentence01"
    seq_dir.mkdir(parents=True)
    for t in range(3):
        verts = neutral.vertices.reshape(-1) + matrix @ gt[t]
        save_mesh(create_mesh(verts.reshape(-1, 3), neutral.faces),
                  str(seq_dir / f"{t:05}.obj"))

    out = tmp_path / "pseudo_gt"
    main([
        "--neutrals_dir", str(neutrals),
        "--blendshapes_dir", str(blshapes),
        "--mesh_seqs_dir", str(tmp_path / "seqs"),
        "--blendshape_list_path", "/nonexistent",
        "--head_idx_path", "/nonexistent",
        "--blendshapes_coeffs_out_dir", str(out),  # reference flag name
    ])
    got = load_blendshape_coeffs(str(out / pid / "sentence01.csv"))
    assert got.shape == (3, 32)
    # the sequence was synthesized from in-bounds smooth coefficients, so
    # the QP must reconstruct the vertex trajectories near-exactly
    recon = got @ matrix.T
    want = gt @ matrix.T
    assert np.max(np.abs(recon - want)) < 5e-4
