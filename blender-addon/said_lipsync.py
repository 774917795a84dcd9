"""Blender add-on: import/export SAiD blendshape-coefficient animations.

A fresh implementation of the visualization workflow the reference ships
(``blender-addon/lipsync.py``), consuming the identical CSV schema this
framework emits (header = 32 ARKit blendshape names, one row per frame):

- build a facial model with shape keys from a neutral OBJ + a directory
  of blendshape OBJs,
- import a coefficient CSV as shape-key keyframes at a chosen fps
  (with optional audio on the sequencer),
- import a raw mesh-sequence directory as frame-by-frame animation,
- export the current shape-key animation back to CSV,
- visualize per-vertex differences between two animated meshes as a
  vertex-color heatmap.

Install via Edit → Preferences → Add-ons → Install… and enable
"SAiD Lipsync Tools"; panels appear in the 3D-view sidebar ("SAiD" tab).
"""

bl_info = {
    "name": "SAiD Lipsync Tools",
    "description": "Speech-driven blendshape animation import/export",
    "version": (0, 1, 0),
    "blender": (3, 0, 0),
    "category": "Animation",
}

import csv
import os

try:
    import bpy
    from bpy_extras.io_utils import ExportHelper
except ImportError:  # imported outside Blender (tests/docs)
    bpy = None
    ExportHelper = object


if bpy is not None:

    class SaidLipsyncProperties(bpy.types.PropertyGroup):
        neutral_path: bpy.props.StringProperty(
            name="Neutral OBJ", subtype="FILE_PATH"
        )
        blendshapes_dir: bpy.props.StringProperty(
            name="Blendshapes Dir", subtype="DIR_PATH"
        )
        coeffs_path: bpy.props.StringProperty(
            name="Coefficients CSV", subtype="FILE_PATH"
        )
        audio_path: bpy.props.StringProperty(name="Audio WAV", subtype="FILE_PATH")
        mesh_seq_dir: bpy.props.StringProperty(
            name="Mesh Sequence Dir", subtype="DIR_PATH"
        )
        fps: bpy.props.IntProperty(name="FPS", default=60, min=1)
        start_frame: bpy.props.IntProperty(
            name="Start Frame", default=1,
            description="Scene frame the first CSV row lands on",
        )
        audio_offset: bpy.props.FloatProperty(
            name="Audio Offset (s)", default=0.0,
            description="Delay the audio strip by this many seconds "
            "relative to the first animation frame",
        )
        target_a: bpy.props.PointerProperty(name="Object A", type=bpy.types.Object)
        target_b: bpy.props.PointerProperty(name="Object B", type=bpy.types.Object)
        max_diff: bpy.props.FloatProperty(
            name="Max Diff", default=0.001, min=1e-6,
            description="Difference mapped to full color (1/multiplier)",
        )
        vis_option: bpy.props.EnumProperty(
            name="Vis Option",
            items=[
                ("Heatmap", "Heatmap", "blue→red by normalized distance"),
                ("Amplitude", "Amplitude", "grayscale |diff|·multiplier"),
                ("Vector", "Vector", "RGB = |diff.xyz|·multiplier"),
            ],
            default="Heatmap",
        )

    def _load_csv(path):
        with open(path, newline="") as f:
            reader = csv.reader(f)
            header = next(reader)
            rows = [[float(x) for x in row] for row in reader if row]
        return header, rows

    class SAID_OT_build_model(bpy.types.Operator):
        """Create a mesh with one shape key per blendshape OBJ"""

        bl_idname = "said_lipsync.build_model"
        bl_label = "Build Blendshape Model"

        def execute(self, context):
            props = context.scene.said_lipsync
            bpy.ops.wm.obj_import(filepath=bpy.path.abspath(props.neutral_path))
            obj = context.active_object
            obj.shape_key_add(name="Basis")

            bl_dir = bpy.path.abspath(props.blendshapes_dir)
            for fname in sorted(os.listdir(bl_dir)):
                if not fname.lower().endswith(".obj"):
                    continue
                bpy.ops.wm.obj_import(filepath=os.path.join(bl_dir, fname))
                bl_obj = context.active_object
                key = obj.shape_key_add(name=os.path.splitext(fname)[0])
                for i, v in enumerate(bl_obj.data.vertices):
                    key.data[i].co = v.co
                bpy.data.objects.remove(bl_obj, do_unlink=True)

            context.view_layer.objects.active = obj
            self.report({"INFO"}, f"built model with {len(obj.data.shape_keys.key_blocks) - 1} shape keys")
            return {"FINISHED"}

    class SAID_OT_import_animation(bpy.types.Operator):
        """Keyframe shape keys from a coefficient CSV (+ optional audio)"""

        bl_idname = "said_lipsync.import_animation"
        bl_label = "Import Coefficient Animation"

        def execute(self, context):
            props = context.scene.said_lipsync
            obj = context.active_object
            if obj is None or obj.data.shape_keys is None:
                self.report({"ERROR"}, "select the blendshape model first")
                return {"CANCELLED"}

            header, rows = _load_csv(bpy.path.abspath(props.coeffs_path))
            keys = obj.data.shape_keys.key_blocks

            context.scene.render.fps = props.fps
            start = props.start_frame
            for frame, row in enumerate(rows, start=start):
                for name, value in zip(header, row):
                    if name in keys:
                        keys[name].value = value
                        keys[name].keyframe_insert("value", frame=frame)
            context.scene.frame_end = max(
                context.scene.frame_end, start + len(rows) - 1
            )

            if props.audio_path:
                if not context.scene.sequence_editor:
                    context.scene.sequence_editor_create()
                audio_frame = start + int(round(props.audio_offset * props.fps))
                context.scene.sequence_editor.sequences.new_sound(
                    "said_audio", bpy.path.abspath(props.audio_path), 1, audio_frame
                )
            self.report({"INFO"}, f"keyframed {len(rows)} frames from {start}")
            return {"FINISHED"}

    class SAID_OT_import_mesh_sequence(bpy.types.Operator):
        """Import an OBJ/PLY directory as a frame-by-frame vertex animation"""

        bl_idname = "said_lipsync.import_mesh_sequence"
        bl_label = "Import Mesh Sequence"

        def execute(self, context):
            props = context.scene.said_lipsync
            seq_dir = bpy.path.abspath(props.mesh_seq_dir)
            files = sorted(
                f for f in os.listdir(seq_dir) if f.lower().endswith((".obj", ".ply"))
            )
            if not files:
                self.report({"ERROR"}, "no OBJ/PLY files in the directory")
                return {"CANCELLED"}

            first = files[0]
            if first.lower().endswith(".obj"):
                bpy.ops.wm.obj_import(filepath=os.path.join(seq_dir, first))
            else:
                bpy.ops.wm.ply_import(filepath=os.path.join(seq_dir, first))
            obj = context.active_object
            obj.shape_key_add(name="Basis")

            context.scene.render.fps = props.fps
            for frame, fname in enumerate(files[1:], start=2):
                path = os.path.join(seq_dir, fname)
                if fname.lower().endswith(".obj"):
                    bpy.ops.wm.obj_import(filepath=path)
                else:
                    bpy.ops.wm.ply_import(filepath=path)
                tmp = context.active_object
                key = obj.shape_key_add(name=f"frame{frame:05}")
                for i, v in enumerate(tmp.data.vertices):
                    key.data[i].co = v.co
                bpy.data.objects.remove(tmp, do_unlink=True)
                key.value = 0.0
                key.keyframe_insert("value", frame=frame - 1)
                key.value = 1.0
                key.keyframe_insert("value", frame=frame)
                key.value = 0.0
                key.keyframe_insert("value", frame=frame + 1)

            if props.audio_path:
                if not context.scene.sequence_editor:
                    context.scene.sequence_editor_create()
                context.scene.sequence_editor.sequences.new_sound(
                    "said_audio", bpy.path.abspath(props.audio_path), 1, 1
                )
            context.scene.frame_end = max(context.scene.frame_end, len(files))
            context.view_layer.objects.active = obj
            return {"FINISHED"}

    class SAID_OT_export_animation(bpy.types.Operator, ExportHelper):
        """Export the active object's shape-key animation to CSV"""

        bl_idname = "said_lipsync.export_animation"
        bl_label = "Export Coefficient CSV"
        filename_ext = ".csv"

        def execute(self, context):
            obj = context.active_object
            if obj is None or obj.data.shape_keys is None:
                self.report({"ERROR"}, "select an animated blendshape model")
                return {"CANCELLED"}
            keys = [k for k in obj.data.shape_keys.key_blocks if k.name != "Basis"]
            scene = context.scene
            rows = []
            current = scene.frame_current
            for frame in range(scene.frame_start, scene.frame_end + 1):
                scene.frame_set(frame)
                rows.append([k.value for k in keys])
            scene.frame_set(current)

            with open(self.filepath, "w", newline="") as f:
                writer = csv.writer(f)
                writer.writerow([k.name for k in keys])
                writer.writerows(rows)
            self.report({"INFO"}, f"exported {len(rows)} frames")
            return {"FINISHED"}

    class SAID_OT_visualize_difference(bpy.types.Operator):
        """Per-vertex distance between two animated meshes, keyframed as an
        ANIMATED vertex-color heatmap (one fcurve per loop color channel,
        like the reference ``lipsync.py:642-756``), with a vertex-color
        material attached so the viewport shows it directly."""

        bl_idname = "said_lipsync.visualize_difference"
        bl_label = "Visualize Difference"

        DIFF_MATERIAL = "said_diff_material"
        DIFF_ACTION = "said_diff_action"

        def _diff_color(self, props, diff):
            mult = 1.0 / props.max_diff
            if props.vis_option == "Vector":
                return (
                    abs(diff[0]) * mult,
                    abs(diff[1]) * mult,
                    abs(diff[2]) * mult,
                )
            amp = diff.length * mult
            if props.vis_option == "Amplitude":
                return (amp, amp, amp)
            d = min(amp, 1.0)  # Heatmap: blue → red
            return (d, 0.0, 1.0 - d)

        def execute(self, context):
            props = context.scene.said_lipsync
            a, b = props.target_a, props.target_b
            if a is None or b is None or len(a.data.vertices) != len(b.data.vertices):
                self.report({"ERROR"}, "pick two objects with matching topology")
                return {"CANCELLED"}

            scene = context.scene
            depsgraph = context.evaluated_depsgraph_get()
            mesh = a.data
            if not mesh.vertex_colors:
                mesh.vertex_colors.new(name="said_diff")

            # vertex-color material so the animation is visible unshaded
            if self.DIFF_MATERIAL not in bpy.data.materials:
                mat = bpy.data.materials.new(name=self.DIFF_MATERIAL)
                mat.use_nodes = True
                vcolor = mat.node_tree.nodes.new("ShaderNodeVertexColor")
                bsdf = mat.node_tree.nodes["Principled BSDF"]
                mat.node_tree.links.new(vcolor.outputs[0], bsdf.inputs[0])
            mat = bpy.data.materials[self.DIFF_MATERIAL]
            if mat.name not in [m.name for m in mesh.materials if m]:
                mesh.materials.append(mat)
                idx = len(mesh.materials) - 1
                for poly in mesh.polygons:
                    poly.material_index = idx

            # per-frame per-loop colors (evaluated meshes: shape keys and
            # modifiers applied — the reference reads raw mesh.vertices,
            # which misses shape-key deformation)
            frames = list(range(scene.frame_start, scene.frame_end + 1))
            num_loops = len(mesh.loops)
            colors = [[None] * num_loops for _ in frames]
            current = scene.frame_current
            for fi, frame in enumerate(frames):
                scene.frame_set(frame)
                ea = a.evaluated_get(depsgraph).data
                eb = b.evaluated_get(depsgraph).data
                for loop in mesh.loops:
                    va = ea.vertices[loop.vertex_index].co
                    vb = eb.vertices[loop.vertex_index].co
                    colors[fi][loop.index] = self._diff_color(props, va - vb)
            scene.frame_set(current)

            # keyframe the whole animation: one fcurve per loop × RGB,
            # bulk-filled with foreach_set (fast for thousands of loops)
            mesh.animation_data_create()
            action = bpy.data.actions.new(name=self.DIFF_ACTION)
            mesh.animation_data.action = action
            for loop_idx in range(num_loops):
                for ch in range(3):
                    fcurve = action.fcurves.new(
                        data_path=f"vertex_colors.active.data[{loop_idx}].color",
                        index=ch,
                    )
                    fcurve.keyframe_points.add(count=len(frames))
                    fcurve.keyframe_points.foreach_set(
                        "co",
                        [
                            x
                            for fi, frame in enumerate(frames)
                            for x in (frame, colors[fi][loop_idx][ch])
                        ],
                    )
            self.report(
                {"INFO"},
                f"keyframed {len(frames)} frames × {num_loops} loops "
                f"({props.vis_option})",
            )
            return {"FINISHED"}

    class SAID_PT_panel(bpy.types.Panel):
        bl_idname = "SAID_PT_lipsync_panel"
        bl_label = "SAiD Lipsync"
        bl_space_type = "VIEW_3D"
        bl_region_type = "UI"
        bl_category = "SAiD"

        def draw(self, context):
            props = context.scene.said_lipsync
            col = self.layout.column()
            col.prop(props, "neutral_path")
            col.prop(props, "blendshapes_dir")
            col.operator(SAID_OT_build_model.bl_idname)
            col.separator()
            col.prop(props, "coeffs_path")
            col.prop(props, "audio_path")
            col.prop(props, "fps")
            col.prop(props, "start_frame")
            col.prop(props, "audio_offset")
            col.operator(SAID_OT_import_animation.bl_idname)
            col.operator(SAID_OT_export_animation.bl_idname)
            col.separator()
            col.prop(props, "mesh_seq_dir")
            col.operator(SAID_OT_import_mesh_sequence.bl_idname)
            col.separator()
            col.prop(props, "target_a")
            col.prop(props, "target_b")
            col.prop(props, "max_diff")
            col.prop(props, "vis_option")
            col.operator(SAID_OT_visualize_difference.bl_idname)

    _CLASSES = [
        SaidLipsyncProperties,
        SAID_OT_build_model,
        SAID_OT_import_animation,
        SAID_OT_import_mesh_sequence,
        SAID_OT_export_animation,
        SAID_OT_visualize_difference,
        SAID_PT_panel,
    ]

    def register():
        for cls in _CLASSES:
            bpy.utils.register_class(cls)
        bpy.types.Scene.said_lipsync = bpy.props.PointerProperty(
            type=SaidLipsyncProperties
        )

    def unregister():
        for cls in reversed(_CLASSES):
            bpy.utils.unregister_class(cls)
        del bpy.types.Scene.said_lipsync
