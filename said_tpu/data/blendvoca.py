"""BlendVOCA dataset family — splits, discovery, windowing, augmentation.

Behavioral contract (from ``script/dataset/dataset_voca.py``):

- canonical subject splits: 8 train / 2 val / 2 test FaceTalk IDs;
  sentences 1–40; 60 fps; the 32 ARKit class names and their 11 L/R
  mirror pairs.
- file discovery with the repeat regex ``(-.+)?`` so multi-sample
  generations (``sentenceXX-k.csv``) are picked up.
- train collate does the windowing: one random window size per batch in
  [window_size_min, min sequence length], replicate padding, random
  start offset centered sampling, and an optional ±1-sample audio delay.
- per-item augmentation: CFG uncondition draw (p=0.1), horizontal flip
  swapping mirror-pair columns (p=0.5), optional zero-out.

Everything is host-side numpy; randomness flows through an explicit
``numpy.random.Generator`` so runs are reproducible.
"""

from __future__ import annotations

import dataclasses
import glob
import os
import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from said_tpu.utils.audio import load_audio
from said_tpu.utils.blendshape import load_blendshape_coeffs, load_blendshape_deltas
from said_tpu.utils.parser import parse_list

PERSON_IDS_TRAIN = [
    "FaceTalk_170725_00137_TA",
    "FaceTalk_170728_03272_TA",
    "FaceTalk_170811_03274_TA",
    "FaceTalk_170904_00128_TA",
    "FaceTalk_170904_03276_TA",
    "FaceTalk_170912_03278_TA",
    "FaceTalk_170913_03279_TA",
    "FaceTalk_170915_00223_TA",
]
PERSON_IDS_VAL = [
    "FaceTalk_170811_03275_TA",
    "FaceTalk_170908_03277_TA",
]
PERSON_IDS_TEST = [
    "FaceTalk_170731_00024_TA",
    "FaceTalk_170809_00138_TA",
]

SENTENCE_IDS = list(range(1, 41))
FPS = 60

BLENDSHAPE_CLASSES = [
    "jawForward",
    "jawLeft",
    "jawRight",
    "jawOpen",
    "mouthClose",
    "mouthFunnel",
    "mouthPucker",
    "mouthLeft",
    "mouthRight",
    "mouthSmileLeft",
    "mouthSmileRight",
    "mouthFrownLeft",
    "mouthFrownRight",
    "mouthDimpleLeft",
    "mouthDimpleRight",
    "mouthStretchLeft",
    "mouthStretchRight",
    "mouthRollLower",
    "mouthRollUpper",
    "mouthShrugLower",
    "mouthShrugUpper",
    "mouthPressLeft",
    "mouthPressRight",
    "mouthLowerDownLeft",
    "mouthLowerDownRight",
    "mouthUpperUpLeft",
    "mouthUpperUpRight",
    "cheekPuff",
    "cheekSquintLeft",
    "cheekSquintRight",
    "noseSneerLeft",
    "noseSneerRight",
]

BLENDSHAPE_MIRROR_PAIRS = [
    ("jawLeft", "jawRight"),
    ("mouthLeft", "mouthRight"),
    ("mouthSmileLeft", "mouthSmileRight"),
    ("mouthFrownLeft", "mouthFrownRight"),
    ("mouthDimpleLeft", "mouthDimpleRight"),
    ("mouthStretchLeft", "mouthStretchRight"),
    ("mouthPressLeft", "mouthPressRight"),
    ("mouthLowerDownLeft", "mouthLowerDownRight"),
    ("mouthUpperUpLeft", "mouthUpperUpRight"),
    ("cheekSquintLeft", "cheekSquintRight"),
    ("noseSneerLeft", "noseSneerRight"),
]


@dataclasses.dataclass
class DataItem:
    waveform: Optional[np.ndarray]  # (T_a,)
    blendshape_coeffs: Optional[np.ndarray]  # (T_b, C)
    cond: bool = True
    blendshape_delta: Optional[np.ndarray] = None  # (C, |V|, 3)
    person_id: Optional[str] = None
    sentence_id: Optional[int] = None


@dataclasses.dataclass
class DataBatch:
    waveform: List[np.ndarray]
    blendshape_coeffs: Optional[np.ndarray]  # (B, T_b, C)
    cond: np.ndarray  # (B,) bool
    blendshape_delta: Optional[np.ndarray] = None  # (B, C, |V|, 3)
    person_ids: Optional[List[str]] = None
    sentence_ids: Optional[List[int]] = None


@dataclasses.dataclass
class BlendVOCADataPath:
    person_id: str
    sentence_id: int
    audio: Optional[str]
    blendshape_coeffs: Optional[str]


def get_data_paths(
    audio_dir: str,
    blendshape_coeffs_dir: Optional[str],
    person_ids: List[str],
    repeat_regex: str = "(-.+)?",
) -> List[BlendVOCADataPath]:
    """Discover (audio, coeffs) pairs per subject/sentence."""
    data_paths = []
    for pid in person_ids:
        audio_id_dir = os.path.join(audio_dir, pid)
        coeffs_id_dir = (
            os.path.join(blendshape_coeffs_dir, pid) if blendshape_coeffs_dir else None
        )
        for sid in SENTENCE_IDS:
            base = f"sentence{sid:02}"
            audio_path = os.path.join(audio_id_dir, f"{base}.wav")
            if not os.path.exists(audio_path):
                continue
            if coeffs_id_dir and os.path.exists(coeffs_id_dir):
                pattern = re.compile(rf"^{base}{repeat_regex}\.csv$")
                for filename in sorted(os.listdir(coeffs_id_dir)):
                    if pattern.match(filename):
                        data_paths.append(
                            BlendVOCADataPath(
                                person_id=pid,
                                sentence_id=sid,
                                audio=audio_path,
                                blendshape_coeffs=os.path.join(coeffs_id_dir, filename),
                            )
                        )
            else:
                data_paths.append(
                    BlendVOCADataPath(
                        person_id=pid,
                        sentence_id=sid,
                        audio=audio_path,
                        blendshape_coeffs=None,
                    )
                )
    return data_paths


def _mirror_index_maps(classes, pairs) -> Tuple[List[int], List[int]]:
    src, dst = [], []
    for l, r in pairs:
        il, ir = classes.index(l), classes.index(r)
        src.extend([il, ir])
        dst.extend([ir, il])
    return src, dst


def default_collate(items: List[DataItem]) -> DataBatch:
    """Stack same-length items (val/test/eval collate)."""
    waveforms = [np.asarray(it.waveform) for it in items]
    coeffs = None
    if items and items[0].blendshape_coeffs is not None:
        coeffs = np.stack([it.blendshape_coeffs for it in items])
    cond = np.array([it.cond for it in items], dtype=bool)
    deltas = None
    if items and items[0].blendshape_delta is not None:
        deltas = np.stack([it.blendshape_delta for it in items])
    person_ids = [it.person_id for it in items] if items and items[0].person_id else None
    sentence_ids = (
        [it.sentence_id for it in items] if items and items[0].sentence_id else None
    )
    return DataBatch(
        waveform=waveforms,
        blendshape_coeffs=coeffs,
        cond=cond,
        blendshape_delta=deltas,
        person_ids=person_ids,
        sentence_ids=sentence_ids,
    )


class _PreloadMixin:
    """Shared audio/coeff preloading and blendshape-delta handling."""

    def _load_deltas(self, blendshape_deltas_path, landmarks_path):
        self.blendshape_deltas = (
            load_blendshape_deltas(blendshape_deltas_path)
            if blendshape_deltas_path
            else None
        )
        self.landmarks = parse_list(landmarks_path, int) if landmarks_path else None

    def _delta_for(self, person_id: str) -> Optional[np.ndarray]:
        if not self.blendshape_deltas:
            return None
        delta = np.stack(list(self.blendshape_deltas[person_id].values()), axis=0).astype(
            np.float32
        )
        if self.landmarks:
            delta = delta[:, self.landmarks, :]
        return delta

    def _preload_all(self, sampling_rate: int, coeffs_required: bool = True):
        self.data_preload = []
        self.blendshape_deltas_preload: Dict[str, Optional[np.ndarray]] = {}
        for data in self.data_paths:
            waveform = load_audio(data.audio, sampling_rate)
            coeffs = (
                load_blendshape_coeffs(data.blendshape_coeffs)
                if data.blendshape_coeffs
                else None
            )
            if coeffs_required and coeffs is None:
                raise FileNotFoundError(f"missing coeffs for {data.audio}")
            self.data_preload.append((waveform, coeffs))
            if data.person_id not in self.blendshape_deltas_preload:
                self.blendshape_deltas_preload[data.person_id] = self._delta_for(
                    data.person_id
                )


class BlendVOCATrainDataset(_PreloadMixin):
    """Training set: full clips in RAM; windowing happens in collate."""

    def __init__(
        self,
        audio_dir: str,
        blendshape_coeffs_dir: str,
        blendshape_deltas_path: Optional[str] = None,
        landmarks_path: Optional[str] = None,
        sampling_rate: int = 16000,
        window_size_min: int = 120,
        uncond_prob: float = 0.1,
        zero_prob: float = 0.0,
        hflip: bool = True,
        delay: bool = True,
        delay_thres: int = 1,
        classes: List[str] = BLENDSHAPE_CLASSES,
        classes_mirror_pair=BLENDSHAPE_MIRROR_PAIRS,
        preload: bool = True,
        seed: int = 0,
    ):
        self.sampling_rate = sampling_rate
        self.window_size_min = window_size_min
        self.uncond_prob = uncond_prob
        self.zero_prob = zero_prob
        self.hflip = hflip
        self.delay = delay
        self.delay_thres = delay_thres
        self.classes = classes
        self.fps = FPS
        self.rng = np.random.default_rng(seed)
        self.mirror_src, self.mirror_dst = _mirror_index_maps(classes, classes_mirror_pair)
        self.data_paths = get_data_paths(audio_dir, blendshape_coeffs_dir, PERSON_IDS_TRAIN)
        self._load_deltas(blendshape_deltas_path, landmarks_path)
        self.preload = preload
        if preload:
            self._preload_all(sampling_rate)

    def __len__(self) -> int:
        return len(self.data_paths)

    def __getitem__(self, index: int) -> DataItem:
        data = self.data_paths[index]
        if self.preload:
            waveform, coeffs = self.data_preload[index]
            delta = self.blendshape_deltas_preload[data.person_id]
        else:
            waveform = load_audio(data.audio, self.sampling_rate)
            coeffs = load_blendshape_coeffs(data.blendshape_coeffs)
            delta = self._delta_for(data.person_id)

        coeffs = np.array(coeffs)  # copy; augmentations mutate

        cond = self.rng.uniform() > self.uncond_prob

        if self.hflip and self.rng.uniform() < 0.5:
            coeffs[:, self.mirror_src] = coeffs[:, self.mirror_dst]

        if self.rng.uniform() < self.zero_prob:
            waveform = np.zeros_like(waveform)
            coeffs = np.zeros_like(coeffs)

        return DataItem(
            waveform=waveform,
            blendshape_coeffs=coeffs,
            cond=cond,
            blendshape_delta=delta,
        )

    def collate_fn(self, items: List[DataItem]) -> DataBatch:
        """Batch windowing: random size, replicate-pad, centered random
        start, optional ±delay_thres audio delay (reference collate,
        ``dataset_voca.py:522-624``)."""
        rng = self.rng
        cond = np.array([it.cond for it in items], dtype=bool)
        deltas = None
        if items and items[0].blendshape_delta is not None:
            deltas = np.stack([it.blendshape_delta for it in items])

        coeffs_list = [it.blendshape_coeffs for it in items]
        wave_list = [it.waveform for it in items]

        bc_min_len = min(c.shape[0] for c in coeffs_list)
        window_size = int(rng.integers(self.window_size_min, bc_min_len + 1))
        waveform_window_len = (self.sampling_rate * window_size) // self.fps

        half_window = window_size // 2
        half_wave = waveform_window_len // 2

        wave_windows, coeff_windows = [], []
        for waveform, coeffs in zip(wave_list, coeffs_list):
            blendshape_len = coeffs.shape[0]
            bdx = int(
                rng.integers(-half_window, max(0, blendshape_len - half_window - 1) + 1)
            )
            wdx = (self.sampling_rate * bdx) // self.fps
            if self.delay and rng.uniform() < 0.5:
                wdx = int(rng.integers(wdx - self.delay_thres, wdx + self.delay_thres + 1))

            bdx_update = bdx + half_window
            coeffs_padded = np.pad(
                coeffs, ((half_window, window_size), (0, 0)), mode="edge"
            )
            coeff_windows.append(coeffs_padded[bdx_update : bdx_update + window_size])

            wdx_update = max(0, wdx + half_wave + self.delay_thres)
            wave_padded = np.pad(
                waveform,
                (half_wave + self.delay_thres, waveform_window_len + self.delay_thres),
                mode="edge",
            )
            wave_windows.append(wave_padded[wdx_update : wdx_update + waveform_window_len])

        return DataBatch(
            waveform=[np.asarray(w) for w in wave_windows],
            blendshape_coeffs=np.stack(coeff_windows),
            cond=cond,
            blendshape_delta=deltas,
        )


class BlendVOCAValDataset(_PreloadMixin):
    """Validation set: full-length sequences, audio fit to coeff length."""

    def __init__(
        self,
        audio_dir: str,
        blendshape_coeffs_dir: str,
        blendshape_deltas_path: Optional[str] = None,
        landmarks_path: Optional[str] = None,
        sampling_rate: int = 16000,
        uncond_prob: float = 0.1,
        zero_prob: float = 0.0,
        hflip: bool = True,
        classes: List[str] = BLENDSHAPE_CLASSES,
        classes_mirror_pair=BLENDSHAPE_MIRROR_PAIRS,
        preload: bool = True,
        seed: int = 0,
    ):
        self.sampling_rate = sampling_rate
        self.uncond_prob = uncond_prob
        self.zero_prob = zero_prob
        self.hflip = hflip
        self.classes = classes
        self.fps = FPS
        self.rng = np.random.default_rng(seed)
        self.mirror_src, self.mirror_dst = _mirror_index_maps(classes, classes_mirror_pair)
        self.data_paths = get_data_paths(audio_dir, blendshape_coeffs_dir, PERSON_IDS_VAL)
        self._load_deltas(blendshape_deltas_path, landmarks_path)
        self.preload = preload
        if preload:
            self._preload_all(sampling_rate)

    collate_fn = staticmethod(default_collate)

    def __len__(self) -> int:
        return len(self.data_paths)

    def __getitem__(self, index: int) -> DataItem:
        data = self.data_paths[index]
        if self.preload:
            waveform, coeffs = self.data_preload[index]
            delta = self.blendshape_deltas_preload[data.person_id]
        else:
            waveform = load_audio(data.audio, self.sampling_rate)
            coeffs = load_blendshape_coeffs(data.blendshape_coeffs)
            delta = self._delta_for(data.person_id)

        coeffs = np.array(coeffs)
        blendshape_len = coeffs.shape[0]
        wave_len = (self.sampling_rate * blendshape_len) // self.fps
        window = np.zeros(wave_len, dtype=np.float32)
        tmp = waveform[:wave_len]
        window[: tmp.shape[0]] = tmp

        cond = self.rng.uniform() > self.uncond_prob
        if self.rng.uniform() < self.zero_prob:
            window = np.zeros_like(window)
            coeffs = np.zeros_like(coeffs)

        return DataItem(
            waveform=window,
            blendshape_coeffs=coeffs,
            cond=cond,
            blendshape_delta=delta,
        )


class BlendVOCATestDataset(_PreloadMixin):
    """Test set: audio-only is OK (coeffs optional)."""

    def __init__(
        self,
        audio_dir: str,
        blendshape_coeffs_dir: Optional[str] = None,
        blendshape_deltas_path: Optional[str] = None,
        sampling_rate: int = 16000,
        preload: bool = True,
    ):
        self.sampling_rate = sampling_rate
        self.fps = FPS
        self.data_paths = get_data_paths(audio_dir, blendshape_coeffs_dir, PERSON_IDS_TEST)
        self._load_deltas(blendshape_deltas_path, None)
        self.preload = preload
        if preload:
            self._preload_all(sampling_rate, coeffs_required=False)

    collate_fn = staticmethod(default_collate)

    def __len__(self) -> int:
        return len(self.data_paths)

    def __getitem__(self, index: int) -> DataItem:
        data = self.data_paths[index]
        if self.preload:
            waveform, coeffs = self.data_preload[index]
            delta = self.blendshape_deltas_preload[data.person_id]
        else:
            waveform = load_audio(data.audio, self.sampling_rate)
            coeffs = (
                load_blendshape_coeffs(data.blendshape_coeffs)
                if data.blendshape_coeffs
                else None
            )
            delta = self._delta_for(data.person_id)

        window = waveform
        if coeffs is not None:
            wave_len = (self.sampling_rate * coeffs.shape[0]) // self.fps
            window = np.zeros(wave_len, dtype=np.float32)
            tmp = waveform[:wave_len]
            window[: tmp.shape[0]] = tmp

        return DataItem(
            waveform=window, blendshape_coeffs=coeffs, blendshape_delta=delta
        )


class BlendVOCAEvalDataset(_PreloadMixin):
    """Eval set: audio+coeffs with person/sentence ids for metric grouping."""

    def __init__(
        self,
        audio_dir: str,
        blendshape_coeffs_dir: str,
        blendshape_deltas_path: Optional[str] = None,
        sampling_rate: int = 16000,
        classes: List[str] = BLENDSHAPE_CLASSES,
        preload: bool = True,
        repeat_regex: str = "(-.+)?",
    ):
        self.sampling_rate = sampling_rate
        self.classes = classes
        self.fps = FPS
        self.data_paths = get_data_paths(
            audio_dir, blendshape_coeffs_dir, PERSON_IDS_TEST, repeat_regex
        )
        self._load_deltas(blendshape_deltas_path, None)
        self.preload = preload
        if preload:
            self._preload_all(sampling_rate)

    collate_fn = staticmethod(default_collate)

    def __len__(self) -> int:
        return len(self.data_paths)

    def __getitem__(self, index: int) -> DataItem:
        data = self.data_paths[index]
        if self.preload:
            waveform, coeffs = self.data_preload[index]
            delta = self.blendshape_deltas_preload[data.person_id]
        else:
            waveform = load_audio(data.audio, self.sampling_rate)
            coeffs = load_blendshape_coeffs(data.blendshape_coeffs)
            delta = self._delta_for(data.person_id)

        wave_len = (self.sampling_rate * coeffs.shape[0]) // self.fps
        window = np.zeros(wave_len, dtype=np.float32)
        tmp = waveform[:wave_len]
        window[: tmp.shape[0]] = tmp

        return DataItem(
            waveform=window,
            blendshape_coeffs=np.array(coeffs),
            blendshape_delta=delta,
            person_id=data.person_id,
            sentence_id=data.sentence_id,
        )


class BlendVOCAVAEDataset:
    """Coefficient-only dataset for VAE training (fixed 120-frame windows)."""

    def __init__(
        self,
        blendshape_coeffs_dir: str,
        window_size: int = 120,
        zero_prob: float = 0.0,
        hflip: bool = True,
        dataset_type: str = "train",
        classes: List[str] = BLENDSHAPE_CLASSES,
        classes_mirror_pair=BLENDSHAPE_MIRROR_PAIRS,
        seed: int = 0,
    ):
        self.window_size = window_size
        self.zero_prob = zero_prob
        self.hflip = hflip
        self.classes = classes
        self.rng = np.random.default_rng(seed)
        self.mirror_src, self.mirror_dst = _mirror_index_maps(classes, classes_mirror_pair)

        person_ids = {
            "train": PERSON_IDS_TRAIN,
            "val": PERSON_IDS_VAL,
        }.get(dataset_type, PERSON_IDS_TEST)

        self.data_paths = []
        for pid in person_ids:
            coeffs_id_dir = os.path.join(blendshape_coeffs_dir, pid)
            if not os.path.exists(coeffs_id_dir):
                continue
            for sid in SENTENCE_IDS:
                base = f"sentence{sid:02}"
                pattern = re.compile(rf"^{base}(-.+)?\.csv$")
                for filename in sorted(os.listdir(coeffs_id_dir)):
                    if pattern.match(filename):
                        self.data_paths.append(
                            BlendVOCADataPath(
                                person_id=pid,
                                sentence_id=sid,
                                audio=None,
                                blendshape_coeffs=os.path.join(coeffs_id_dir, filename),
                            )
                        )

    def __len__(self) -> int:
        return len(self.data_paths)

    def __getitem__(self, index: int) -> DataItem:
        rng = self.rng
        coeffs = load_blendshape_coeffs(self.data_paths[index].blendshape_coeffs)
        blendshape_len = coeffs.shape[0]
        half = self.window_size // 2

        bdx = int(rng.integers(-half, max(0, blendshape_len - half - 1) + 1))
        bdx_update = bdx + half
        padded = np.pad(coeffs, ((half, self.window_size), (0, 0)), mode="edge")
        window = np.array(padded[bdx_update : bdx_update + self.window_size])

        if self.hflip and rng.uniform() < 0.5:
            window[:, self.mirror_src] = window[:, self.mirror_dst]
        if rng.uniform() < self.zero_prob:
            window = np.zeros_like(window)

        return DataItem(waveform=None, blendshape_coeffs=window)

    @staticmethod
    def collate_fn(items: List[DataItem]) -> DataBatch:
        coeffs = np.stack([it.blendshape_coeffs for it in items])
        cond = np.array([it.cond for it in items], dtype=bool)
        return DataBatch(waveform=[], blendshape_coeffs=coeffs, cond=cond)


class BlendVOCAPseudoGTOptDataset:
    """Loads per-person neutral/blendshape meshes and per-sentence mesh
    sequences for the pseudo-GT QP optimizer."""

    def __init__(
        self,
        neutrals_dir: str,
        blendshapes_dir: str,
        mesh_seqs_dir: str,
        blendshapes_names: List[str],
    ):
        self.neutrals_dir = neutrals_dir
        self.blendshapes_dir = blendshapes_dir
        self.mesh_seqs_dir = mesh_seqs_dir
        self.blendshapes_names = blendshapes_names

    def get_blendshapes(self, person_id: str):
        from said_tpu.utils.mesh import load_mesh

        neutral = load_mesh(os.path.join(self.neutrals_dir, f"{person_id}.obj"))
        bl_dir = os.path.join(self.blendshapes_dir, person_id)
        blendshapes = {
            name: load_mesh(os.path.join(bl_dir, f"{name}.obj"))
            for name in self.blendshapes_names
        }
        return neutral, blendshapes

    def get_mesh_seq(self, person_id: str, seq_id: int):
        from said_tpu.utils.mesh import load_mesh

        seq_dir = os.path.join(self.mesh_seqs_dir, person_id, f"sentence{seq_id:02}")
        if not os.path.isdir(seq_dir):
            return []
        files = sorted(
            glob.glob(os.path.join(seq_dir, "**/*.obj"), recursive=True)
            + glob.glob(os.path.join(seq_dir, "**/*.ply"), recursive=True)
        )
        return [load_mesh(p) for p in files]
