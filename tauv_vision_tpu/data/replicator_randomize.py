"""Omniverse Replicator scene randomizer (offline data production).

Parity target: ``replicator/randomize.py`` (and the pool-scene variant
``replicator/randomize_frc_tank.py``) — an Omniverse script registering
per-frame randomizers for the sky HDRI/pose/intensity, sun pose/
temperature, water volume scattering, environment offset, camera-relative
distractor placement, and per-class camera-relative object pose
distributions, then attaching rgb/bbox2d/bbox3d/instance-seg/camera-params
annotators and writing N frames through BasicWriter.

This port is **config-driven**: the reference hardcodes each class's pose
distribution in its own code block (:162-239); here they are data
(`ObjectPlacement` entries), so new classes don't need new code.  It
requires ``omni.replicator.core`` (only available inside Omniverse) and
raises a clear error elsewhere — the conversion side of the pipeline
(data/convert_replicator.py) is fully runnable standalone.

Run inside Omniverse Code:
  omni.code.sh --/omni/replicator/script=.../replicator_randomize.py
"""

from __future__ import annotations

import asyncio
import glob
from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

Vec3 = Tuple[float, float, float]

SCENE_PRIM_PREFIX = "/Replicator/Ref_Xform/Ref"


@dataclass
class ObjectPlacement:
    """Camera-relative pose distribution for one semantic class
    (randomize.py:162-239)."""

    classes: Sequence[str]
    horizontal_location: Tuple[float, float] = (-0.6, 0.6)
    vertical_location: Tuple[float, float] = (-0.6, 0.6)
    distance: Tuple[float, float] = (60.0, 300.0)
    rotation_min: Vec3 = (-180, -180, -180)
    rotation_max: Vec3 = (180, 180, 180)
    randomize_color: bool = False


@dataclass
class RandomizeConfig:
    scene_usd: str
    model_usds: Sequence[str]
    distractor_usds: Sequence[str] = ()
    hdri_globs: Sequence[str] = ()
    output_dir: str = "_replicator_out"
    num_frames: int = 20000
    resolution: Tuple[int, int] = (640, 360)

    # Scene-prim layout + camera rig; the pool-test scene
    # (randomize_frc_tank.py) uses a fixed overhead camera and different
    # prim paths than the open-water scene (randomize.py).
    camera_position: Vec3 = (0.0, 0.0, 0.0)
    camera_rotation: Vec3 = (0.0, 0.0, 0.0)
    sky_prim: str = "Environment/sky"
    water_prim: str = "Looks/Water"
    randomize_sky_pose: bool = True
    enable_sun: bool = True
    enable_environment_offset: bool = True

    sky_intensity: Tuple[float, float] = (200.0, 250.0)
    sky_exposure: Tuple[float, float] = (0.0, 5.0)
    sun_rotation_min: Vec3 = (0, -180, 0)
    sun_rotation_max: Vec3 = (45, 180, 0)
    sun_temperature: Tuple[float, float] = (6500.0, 1000.0)  # mean, std
    sun_intensity: Tuple[float, float] = (0.0, 1000.0)
    water_scattering: Tuple[float, float] = (0.0, 0.05)
    water_thickness: Tuple[float, float] = (1.0, 5.0)
    environment_offset_max: Vec3 = (0, 1000, 0)

    distractor_distance: Tuple[float, float] = (800.0, 1000.0)
    distractor_visible_p: float = 0.2

    placements: Sequence[ObjectPlacement] = field(
        default_factory=lambda: DEFAULT_PLACEMENTS
    )


# The reference's per-class distributions (randomize.py:162-239).
DEFAULT_PLACEMENTS: List[ObjectPlacement] = [
    ObjectPlacement(
        classes=("sample_24_worm", "sample_24_coral", "sample_24_nautilus"),
        distance=(60, 300), randomize_color=True,
    ),
    ObjectPlacement(
        classes=("bin_24", "path_24"),
        distance=(200, 800),
        rotation_min=(-30, -30, -180), rotation_max=(30, 30, 180),
    ),
    ObjectPlacement(
        classes=("gate_24_ccw", "gate_24_cw"),
        horizontal_location=(-0.8, 0.8), vertical_location=(-0.8, 0.8),
        distance=(100, 600),
        rotation_min=(-30, -30, -30), rotation_max=(30, 30, 30),
    ),
    ObjectPlacement(
        classes=("buoy_24",),
        horizontal_location=(-0.8, 0.8), vertical_location=(-0.8, 0.8),
        distance=(100, 600),
        rotation_min=(-30, -30, 0), rotation_max=(30, 30, 0),
    ),
    ObjectPlacement(
        classes=("torpedo_24",),
        distance=(300, 1000),
        rotation_min=(-45, -45, -15), rotation_max=(45, 45, -15),
    ),
]


def build_and_run(config: RandomizeConfig) -> None:
    try:
        import omni.replicator.core as rep
    except ImportError as e:  # pragma: no cover - requires Omniverse
        raise RuntimeError(
            "replicator_randomize must run inside Omniverse "
            "(omni.replicator.core not importable). The converter side "
            "(data/convert_replicator.py) runs standalone."
        ) from e

    hdris: List[str] = []
    for pattern in config.hdri_globs:
        hdris.extend(glob.glob(pattern))

    with rep.new_layer():
        rep.create.from_usd(config.scene_usd)
        for usd in list(config.model_usds) + list(config.distractor_usds):
            rep.create.from_usd(usd)

        camera = rep.create.camera(
            position=config.camera_position, rotation=config.camera_rotation
        )
        render_product = rep.create.render_product(camera, config.resolution)

        def randomize_sky():
            sky = rep.get.prims(f"{SCENE_PRIM_PREFIX}/{config.sky_prim}")
            with sky:
                if config.randomize_sky_pose:
                    rep.modify.pose(
                        rotation=rep.distribution.uniform(
                            (-180, -180, -180), (180, 180, 180)
                        )
                    )
                if hdris:
                    rep.modify.attribute(
                        "texture:file", rep.distribution.choice(hdris)
                    )
                rep.modify.attribute(
                    "intensity", rep.distribution.uniform(*config.sky_intensity)
                )
                rep.modify.attribute(
                    "exposure", rep.distribution.uniform(*config.sky_exposure)
                )
            return sky.node

        def randomize_sun():
            sun = rep.get.prim_at_path(f"{SCENE_PRIM_PREFIX}/Environment/sun")
            with sun:
                rep.modify.pose(
                    rotation=rep.distribution.uniform(
                        config.sun_rotation_min, config.sun_rotation_max
                    )
                )
                rep.modify.attribute(
                    "colorTemperature",
                    rep.distribution.normal(*config.sun_temperature),
                )
                rep.modify.attribute(
                    "intensity",
                    rep.distribution.uniform(*config.sun_intensity),
                )
            return sun.node

        def randomize_water():
            water = rep.get.prim_at_path(
                f"{SCENE_PRIM_PREFIX}/{config.water_prim}"
            )
            with water:
                rep.modify.attribute(
                    "inputs:volume_scattering",
                    rep.distribution.uniform(*config.water_scattering),
                )
                rep.modify.attribute(
                    "inputs:base_thickness",
                    rep.distribution.uniform(*config.water_thickness),
                )
            return water.node

        def randomize_environment():
            environment = rep.get.prim_at_path(
                f"{SCENE_PRIM_PREFIX}/Environment"
            )
            with environment:
                rep.modify.pose(
                    position=rep.distribution.uniform(
                        (0, 200, 0), config.environment_offset_max
                    )
                )
            return environment.node

        def randomize_distractors():
            distractors = rep.get.prims(semantics=[("type", "distractor")])
            with distractors:
                rep.modify.pose_camera_relative(
                    camera=camera,
                    render_product=render_product,
                    horizontal_location=rep.distribution.uniform(-1, 1),
                    vertical_location=rep.distribution.uniform(-1, 1),
                    distance=rep.distribution.uniform(
                        *config.distractor_distance
                    ),
                )
                rep.modify.pose(
                    rotation=rep.distribution.uniform(
                        (-180, -180, -180), (180, 180, 180)
                    )
                )
                rep.modify.visibility(
                    rep.distribution.choice(
                        [True, False],
                        weights=[
                            config.distractor_visible_p,
                            1 - config.distractor_visible_p,
                        ],
                    )
                )
                rep.randomizer.color(
                    colors=rep.distribution.uniform((0, 0, 0), (1, 1, 1))
                )
            return distractors.node

        def randomize_objects():
            obj_prims = rep.get.prims(semantics=[("type", "object")])
            for placement in config.placements:
                group = rep.get.prims(
                    semantics=[("class", c) for c in placement.classes]
                )
                with group:
                    rep.modify.pose_camera_relative(
                        camera=camera,
                        render_product=render_product,
                        horizontal_location=rep.distribution.uniform(
                            *placement.horizontal_location
                        ),
                        vertical_location=rep.distribution.uniform(
                            *placement.vertical_location
                        ),
                        distance=rep.distribution.uniform(*placement.distance),
                    )
                    rep.modify.pose(
                        rotation=rep.distribution.uniform(
                            placement.rotation_min, placement.rotation_max
                        )
                    )
                    if placement.randomize_color:
                        rep.randomizer.color(
                            colors=rep.distribution.uniform(
                                (0, 0, 0), (1, 1, 1)
                            )
                        )
            return obj_prims.node

        randomizers = [randomize_sky, randomize_water,
                       randomize_distractors, randomize_objects]
        if config.enable_sun:
            randomizers.insert(1, randomize_sun)
        if config.enable_environment_offset:
            randomizers.insert(-2, randomize_environment)
        for fn in randomizers:
            rep.randomizer.register(fn)

        # Annotators (randomize.py:245-258).
        annotators = [
            rep.AnnotatorRegistry.get_annotator(name)
            for name in ("rgb", "bounding_box_2d_tight", "bounding_box_3d",
                         "instance_segmentation_fast", "camera_params")
        ]
        for annotator in annotators:
            annotator.attach([render_product])

        writer = rep.WriterRegistry.get("BasicWriter")
        writer.initialize(
            output_dir=config.output_dir,
            rgb=True,
            bounding_box_2d_tight=True,
            bounding_box_3d=True,
            instance_segmentation=True,
            camera_params=True,
        )
        writer.attach([render_product])

        async def run():
            for _ in range(config.num_frames):
                await rep.orchestrator.step_async()

        asyncio.ensure_future(run())


# Pool-test scene preset (replicator/randomize_frc_tank.py:1-180): fixed
# overhead camera in the FRC tank USD, lowercase prim paths, no sun/
# environment randomizers, sample objects close-in with color jitter.
FRC_TANK_CONFIG = RandomizeConfig(
    scene_usd="models/frc_tank_scene/frc_tank_scene.usd",
    model_usds=(
        "models/samples_24/usd/worm.usd",
        "models/samples_24/usd/coral.usd",
        "models/samples_24/usd/nautilus.usd",
    ),
    output_dir="_replicator_frc_tank_out",
    num_frames=10000,
    resolution=(640, 360),
    camera_position=(0.0, 800.0, 0.0),
    camera_rotation=(-90.0, 0.0, 0.0),
    sky_prim="sky",
    water_prim="Looks/water",
    randomize_sky_pose=False,
    enable_sun=False,
    enable_environment_offset=False,
    sky_intensity=(50.0, 1000.0),
    water_scattering=(0.01, 0.1),
    water_thickness=(0.1, 0.5),
    distractor_distance=(800.0, 1000.0),
    distractor_visible_p=1.0,
    placements=[
        ObjectPlacement(
            classes=("sample_24_worm", "sample_24_coral",
                     "sample_24_nautilus"),
            horizontal_location=(-0.75, 0.75),
            vertical_location=(-0.75, 0.75),
            distance=(100, 300),
            rotation_min=(-30, -180, -30), rotation_max=(30, 180, 30),
            randomize_color=True,
        ),
    ],
)


def write_camera_params_probe(config: RandomizeConfig) -> None:
    """One-shot camera-intrinsics dump — the reference's debugging probe
    (replicator/test_camera_params.py, randomize_frc_tank.py:135-146):
    step the orchestrator once and write only the camera_params annotator
    through BasicWriter so the converter's projection-matrix handling can
    be checked without a full render run."""
    try:
        import omni.replicator.core as rep
    except ImportError as e:  # pragma: no cover - requires Omniverse
        raise RuntimeError(
            "write_camera_params_probe must run inside Omniverse"
        ) from e

    with rep.new_layer():
        rep.create.from_usd(config.scene_usd)
        camera = rep.create.camera(
            position=config.camera_position, rotation=config.camera_rotation
        )
        render_product = rep.create.render_product(camera, config.resolution)
        annotator = rep.AnnotatorRegistry.get_annotator("camera_params")
        annotator.attach([render_product])
        writer = rep.BasicWriter(
            output_dir=config.output_dir,
            colorize_instance_segmentation=False,
        )

        async def run():
            await rep.orchestrator.step_async()
            writer.write({
                "trigger_outputs": {"on_time": 0},
                "camera_params": annotator.get_data(),
            })

        asyncio.ensure_future(run())
