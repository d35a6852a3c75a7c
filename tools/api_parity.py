#!/usr/bin/env python3
"""Generate docs/API_PARITY.md: every public reference API symbol
(PL_API functions in /root/reference/src/include/libplacebo/**.h) mapped
to its TPU-native analog, a by-design collapse, or an n/a with reason.

Each "direct" mapping names a Python symbol; the generator verifies it
exists in the repo (grep for the final identifier) and fails loudly on
dangling mappings, so the document can't silently rot.

Usage: python tools/api_parity.py [--check]
"""
from __future__ import annotations

import os
import re
import subprocess
import sys
from collections import OrderedDict

REF = "/root/reference/src/include/libplacebo"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "docs", "API_PARITY.md")

# ---------------------------------------------------------------------------
# Curated mapping: symbol -> (status, analog/reason)
# status: "yes" (direct analog, verified), "design" (collapsed by design),
#         "n/a" (no meaningful TPU counterpart)
# ---------------------------------------------------------------------------

M: dict = {}


def yes(analog, *syms):
    for s in syms:
        M[s] = ("yes", analog)


def design(reason, *syms):
    for s in syms:
        M[s] = ("design", reason)


def na(reason, *syms):
    for s in syms:
        M[s] = ("n/a", reason)


# --- cache.h ---------------------------------------------------------------
yes("`core.cache.cache_create` / `Cache()`", "pl_cache_create")
na("Python GC owns lifetimes", "pl_cache_destroy")
yes("`core.cache.Cache.get`", "pl_cache_get")
yes("`core.cache.Cache.set`", "pl_cache_set")
yes("`core.cache.Cache.try_set`", "pl_cache_try_set")
yes("`core.cache.Cache.save` (bytes; subsumes the `_ex` callback form)",
    "pl_cache_save", "pl_cache_save_ex")
yes("`core.cache.Cache.load`", "pl_cache_load", "pl_cache_load_ex")
yes("`core.cache.Cache.save_file`", "pl_cache_set_file")
yes("`core.cache.Cache.load_file`", "pl_cache_get_file")
yes("`core.cache.Cache.iterate` (generator instead of callback)",
    "pl_cache_iterate")
yes("`core.cache.Cache.num_objects`", "pl_cache_objects")
yes("`core.cache.Cache.total_size`", "pl_cache_size")
yes("`core.cache.Cache.reset`", "pl_cache_reset")
yes("`core.cache.Cache.signature`", "pl_cache_signature")

# --- colorspace.h ----------------------------------------------------------
yes("`core.colorspace.system_is_ycbcr_like`", "pl_color_system_is_ycbcr_like")
yes("`core.colorspace.system_is_linear`", "pl_color_system_is_linear")
yes("`core.colorspace.system_guess_ycbcr`", "pl_color_system_guess_ycbcr")
yes("`core.colorspace.BitEncoding` dataclass equality",
    "pl_bit_encoding_equal")
yes("`core.colorspace.ColorRepr` dataclass equality", "pl_color_repr_equal")
yes("`core.colorspace.ColorRepr.merge`", "pl_color_repr_merge")
yes("`core.colorspace.color_repr_normalize`", "pl_color_repr_normalize")
yes("`core.colorspace.color_repr_decode`", "pl_color_repr_decode")
yes("`core.colorspace.levels_guess`", "pl_color_levels_guess")
yes("`core.colorspace.primaries_is_wide_gamut`",
    "pl_color_primaries_is_wide_gamut")
yes("`core.colorspace.primaries_guess`", "pl_color_primaries_guess")
yes("`core.colorspace.transfer_nominal_peak`",
    "pl_color_transfer_nominal_peak")
yes("`core.transfer.linearize` / `ops.color.linearize` (host/device)",
    "pl_color_linearize")
yes("`core.transfer.delinearize` / `ops.color.delinearize`",
    "pl_color_delinearize")
yes("`core.colorspace.ColorSpace` dataclass equality", "pl_color_space_equal")
yes("`core.colorspace.ColorSpace.is_hdr`", "pl_color_space_is_hdr")
yes("`core.colorspace.ColorSpace.is_black_scaled`",
    "pl_color_space_is_black_scaled")
yes("`core.colorspace.ColorSpace.merge`", "pl_color_space_merge")
yes("`core.colorspace.ColorSpace.infer`", "pl_color_space_infer")
yes("`core.colorspace.ColorSpace.infer_ref`", "pl_color_space_infer_ref")
yes("`core.colorspace.color_space_infer_map`", "pl_color_space_infer_map")
yes("`core.colorspace.ColorSpace.nominal_luma`",
    "pl_color_space_nominal_luma_ex")
yes("`core.colorspace.hdr_rescale`", "pl_hdr_rescale")
yes("`core.colorspace.HdrMetadata.contains`", "pl_hdr_metadata_contains")
yes("`core.colorspace.HdrMetadata.merge`", "pl_hdr_metadata_merge")
yes("`core.colorspace.HdrMetadata` dataclass equality",
    "pl_hdr_metadata_equal")
yes("`utils.dolbyvision.hdr_metadata_from_rpu`",
    "pl_hdr_metadata_from_dovi_rpu")
yes("`core.colorspace.primaries_valid`", "pl_primaries_valid")
yes("`core.colorspace.primaries_compatible`", "pl_primaries_compatible")
yes("`core.colorspace.primaries_superset`", "pl_primaries_superset")
yes("`core.colorspace.RawPrimaries` dataclass equality",
    "pl_raw_primaries_equal")
yes("`core.colorspace.RawPrimaries.merge`", "pl_raw_primaries_merge")
yes("`core.colorspace.RawPrimaries.similar`", "pl_raw_primaries_similar")
yes("`core.colorspace.primaries_get`", "pl_raw_primaries_get")
yes("`core.colorspace.color_mapping_matrix`", "pl_get_color_mapping_matrix")
yes("`core.colorspace.adapt_white_matrix` (CAT16 von Kries)",
    "pl_get_adaptation_matrix")
yes("`core.colorspace.rgb_to_xyz_matrix`", "pl_get_rgb2xyz_matrix")
yes("`core.colorspace.xyz_to_rgb_matrix`", "pl_get_xyz2rgb_matrix")
yes("`core.gamut_mapping.ipt_rgb2lms`", "pl_ipt_rgb2lms")
yes("`core.gamut_mapping.ipt_lms2rgb`", "pl_ipt_lms2rgb")
yes("`core.colorspace.cone_matrix`", "pl_get_cone_matrix")
yes("`core.colorspace.blackbody_from_temp`", "pl_blackbody_from_temp")
yes("`core.colorspace.daylight_from_temp`", "pl_daylight_from_temp")
yes("`core.colorspace.white_from_temp`", "pl_white_from_temp")

# --- common.h ----------------------------------------------------------
yes("`core.common.Rect.normalized`", "pl_rect2d_normalize")
yes("`core.common.RectF.normalized`", "pl_rect2df_normalize")
yes("`core.common.RectF.rounded`", "pl_rect2df_round")
yes("`core.common.RectF.aspect`", "pl_rect2df_aspect")
yes("`core.common.RectF.stretch`", "pl_rect2df_aspect_set")
yes("`core.common.RectF.aspect_copy`", "pl_rect2df_aspect_copy")
yes("`core.common.RectF.aspect_fit`", "pl_rect2df_aspect_fit")
yes("`core.common.RectF.stretch_xy`", "pl_rect2df_stretch")
yes("`core.common.RectF.offset`", "pl_rect2df_offset")
yes("`core.common.RectF.zoom`", "pl_rect2df_zoom")
yes("`core.common.RectF.rotate`", "pl_rect2df_rotate")
yes("`core.common.aspect_rotate`", "pl_aspect_rotate")
na("3D texture regions — 3DLUTs are plain arrays here, no 3D rects",
   "pl_rect3d_normalize", "pl_rect3df_normalize", "pl_rect3df_round",
   "pl_matrix3x3_apply_rc", "pl_transform3x3_apply_rc")
yes("`core.common.Matrix3x3.apply`", "pl_matrix3x3_apply")
yes("`core.common.Matrix3x3.invert`", "pl_matrix3x3_invert")
yes("`core.common.Matrix3x3.__matmul__` (a @ b)", "pl_matrix3x3_mul")
yes("`core.common.Matrix3x3.__matmul__` reversed (b @ a)",
    "pl_matrix3x3_rmul")
yes("`core.common.Matrix3x3.scale`", "pl_matrix3x3_scale")
yes("`core.common.Transform3x3.apply`", "pl_transform3x3_apply")
yes("`core.common.Transform3x3.invert`", "pl_transform3x3_invert")
yes("`core.common.Transform3x3.scale`", "pl_transform3x3_scale")
yes("`core.common.Matrix2x2.apply`", "pl_matrix2x2_apply")
yes("`core.common.Matrix2x2.apply_rc`", "pl_matrix2x2_apply_rc")
yes("`core.common.Matrix2x2.invert`", "pl_matrix2x2_invert")
yes("`core.common.Matrix2x2.__matmul__` (a @ b)", "pl_matrix2x2_mul")
yes("`core.common.Matrix2x2.__matmul__` reversed (b @ a)",
    "pl_matrix2x2_rmul")
yes("`core.common.Matrix2x2.rotation`", "pl_matrix2x2_rotation")
yes("`core.common.Matrix2x2.scale`", "pl_matrix2x2_scale")
yes("`core.common.Transform2x2.apply`", "pl_transform2x2_apply")
yes("`core.common.Transform2x2.apply_rc`", "pl_transform2x2_apply_rc")
yes("`core.common.Transform2x2.compose` (a ∘ b)", "pl_transform2x2_mul")
yes("`core.common.Transform2x2.compose` reversed", "pl_transform2x2_rmul")
yes("`core.common.Transform2x2.invert`", "pl_transform2x2_invert")
yes("`core.common.Transform2x2.scale`", "pl_transform2x2_scale")
yes("`core.common.Transform2x2.bounds`", "pl_transform2x2_bounds")

# --- tone_mapping.h / gamut_mapping.h / filters.h / dither.h ---------------
yes("`core.tone_mapping.generate`", "pl_tone_map_generate")
yes("`core.tone_mapping.sample` (+ traced `apply_device`)",
    "pl_tone_map_sample")
yes("`core.tone_mapping.params_infer`", "pl_tone_map_params_infer")
yes("`core.tone_mapping.params_noop`", "pl_tone_map_params_noop")
yes("`core.tone_mapping.ToneMapParams` dataclass equality",
    "pl_tone_map_params_equal")
yes("`core.gamut_mapping.generate` (3DLUT) + traced `ops.gamut.map_gamut`",
    "pl_gamut_map_generate")
yes("`core.gamut_mapping.sample`", "pl_gamut_map_sample")
yes("`core.gamut_mapping.params_noop`", "pl_gamut_map_params_noop")
yes("`core.gamut_mapping.GamutMapParams` dataclass equality",
    "pl_gamut_map_params_equal")
yes("`core.filters.generate`", "pl_filter_generate")
yes("`core.filters.sample_filter`", "pl_filter_sample")
yes("`core.filters.FilterConfig` dataclass equality", "pl_filter_config_eq")
na("Python GC owns lifetimes", "pl_filter_free")
yes("`core.dither.bayer_matrix`", "pl_generate_bayer_matrix")
yes("`core.dither.blue_noise` (void-and-cluster; C++ energy field in "
    "`native/dither.cc`)", "pl_generate_blue_noise")

# --- log.h -------------------------------------------------------------
yes("`core.log.log_create` / `Log()`", "pl_log_create")
na("Python GC owns lifetimes", "pl_log_destroy")
yes("`core.log.Log.update_level`", "pl_log_level_update")
yes("`core.log.Log` attribute assignment (callback/level are plain "
    "attributes)", "pl_log_update")
yes("`core.log.log_color`", "pl_log_color")
yes("`core.log.log_simple`", "pl_log_simple")

# --- options.h ---------------------------------------------------------
yes("`core.options.Options()`", "pl_options_alloc")
na("Python GC owns lifetimes", "pl_options_free")
yes("`core.options.Options.reset`", "pl_options_reset")
yes("`core.options.Options.get`", "pl_options_get")
yes("`core.options.Options.set`", "pl_options_set_str")
yes("`core.options.Options.parse`", "pl_options_load")
yes("`core.options.Options.save`", "pl_options_save")
yes("`core.options.Options.iterate`", "pl_options_iterate")
yes("`core.options.Options.add_hook`", "pl_options_add_hook")
yes("`core.options.Options.insert_hook`", "pl_options_insert_hook")
yes("`core.options.Options.remove_hook_at`", "pl_options_remove_hook_at")
yes("`core.options.find_option`", "pl_find_option")

# --- renderer.h --------------------------------------------------------
yes("`render.renderer.render_image` / `Renderer.render`", "pl_render_image")
yes("`render.renderer.render_image_mix`", "pl_render_image_mix")
yes("`render.renderer.Renderer()`", "pl_renderer_create")
na("Python GC owns lifetimes", "pl_renderer_destroy")
yes("`render.renderer.Renderer.flush_cache`", "pl_renderer_flush_cache")
yes("`render.renderer.Renderer.get_errors`", "pl_renderer_get_errors")
yes("`render.renderer.Renderer.reset_errors`", "pl_renderer_reset_errors")
yes("`render.renderer.Renderer.get_hdr_metadata`",
    "pl_renderer_get_hdr_metadata")
yes("`render.renderer.Renderer.save`", "pl_renderer_save")
yes("`render.renderer.Renderer.load`", "pl_renderer_load")
yes("`render.frame.Frame.is_cropped`", "pl_frame_is_cropped")
yes("`render.frame.Frame.set_chroma_location`",
    "pl_frame_set_chroma_location")
yes("`render.renderer.frames_infer`", "pl_frames_infer")
yes("`render.renderer.frames_infer_mix`", "pl_frames_infer_mix")
yes("`render.renderer.clear_target`", "pl_frame_clear_rgba",
    "pl_frame_clear")
yes("`render.renderer.clear_target_tiles`", "pl_frame_clear_tiles")
na("no swapchain on TPU — `render.renderer.Target` describes outputs",
   "pl_frame_from_swapchain")

# --- utils/upload.h ----------------------------------------------------
yes("`utils.upload.plane_data_from_mask`", "pl_plane_data_from_mask")
yes("`utils.upload.plane_data_from_comps`", "pl_plane_data_from_comps")
yes("`utils.upload.plane_data_align`", "pl_plane_data_align")
yes("`utils.upload.upload_plane`", "pl_upload_plane")
na("no texel-format objects: planes are float arrays; "
   "`plane_data_align` + `upload_plane` do the negotiation",
   "pl_plane_find_fmt")
na("output planes are arrays produced by the renderer; `Target` "
   "describes them — nothing to pre-create", "pl_recreate_plane")

# --- utils/frame_queue.h -------------------------------------------------
yes("`render.queue.Queue()`", "pl_queue_create")
na("Python GC owns lifetimes", "pl_queue_destroy")
yes("`render.queue.Queue.push` (Frame or lazy SourceFrame with "
    "map/unmap/discard)", "pl_queue_push")
yes("`render.queue.Queue.push_block` (thread-safe producer "
    "backpressure with timeout)", "pl_queue_push_block")
yes("`render.queue.Queue.update`", "pl_queue_update")
yes("`render.queue.Queue.reset`", "pl_queue_reset")
yes("`render.queue.Queue.peek`", "pl_queue_peek")
yes("`render.queue.Queue.num_frames`", "pl_queue_num_frames")
yes("`render.queue.Queue.pts_offset`", "pl_queue_pts_offset")
yes("`render.queue.Queue.estimate_fps`", "pl_queue_estimate_fps")
yes("`render.queue.Queue.estimate_vps`", "pl_queue_estimate_vps")

# --- utils/dolbyvision.h --------------------------------------------------
yes("`utils.dolbyvision.parse_rpu` + `hdr_metadata_from_rpu` (self-"
    "contained bitstream parser; reference delegates to libdovi)",
    "pl_hdr_metadata_from_dovi_rpu")

# --- shaders/*.h routine library -----------------------------------------
yes("`ops.color.decode_color`", "pl_shader_decode_color")
yes("`ops.color.encode_color`", "pl_shader_encode_color")
yes("`ops.color.linearize`", "pl_shader_linearize")
yes("`ops.color.delinearize`", "pl_shader_delinearize")
yes("`ops.color.sigmoidize`", "pl_shader_sigmoidize")
yes("`ops.color.desigmoidize`", "pl_shader_unsigmoidize")
yes("`ops.color.cone_distort`", "pl_shader_cone_distort")
yes("`ops.color.extract_features`", "pl_shader_extract_features")
yes("`ops.dovi.dovi_reshape` (+ `pack_dovi` traced form)",
    "pl_shader_dovi_reshape")
yes("`ops.peak_detect.detect_peak` (radix-percentile histogram + IIR "
    "state)", "pl_shader_detect_peak")
yes("`render.renderer.Renderer.get_hdr_metadata`",
    "pl_get_detected_hdr_metadata")
yes("`render.renderer.Renderer.reset_peak_detection`",
    "pl_reset_detected_peak")
yes("`ops.gamut.color_map_ipt` + renderer color stage (tone+gamut fused "
    "in one LMS roundtrip; Pallas epilogue `ops.pallas.color_map`)",
    "pl_shader_color_map", "pl_shader_color_map_ex")
design("alpha premultiply/unpremultiply handled inline by the renderer "
       "(`render/renderer.py` AlphaMode branches) — traced, no separate "
       "shader entry point", "pl_shader_set_alpha")
yes("`ops.deband.deband`", "pl_shader_deband")
yes("`ops.deinterlace.deinterlace`", "pl_shader_deinterlace")
yes("`ops.dithering.dither`", "pl_shader_dither")
yes("`ops.dithering.error_diffusion` (Pallas wavefront kernel + "
    "shear relayout)", "pl_shader_error_diffusion")
na("VMEM budgeting is internal to the Pallas kernel (BlockSpec sizing)",
   "pl_error_diffusion_shmem_req")
yes("`ops.film_grain.needs_film_grain`", "pl_needs_film_grain")
yes("`ops.film_grain.apply_av1_grain` / "
    "`ops.film_grain_h274.apply_h274_grain`", "pl_shader_film_grain")
yes("`ops.icc` `decode_profile`/`encode_profile` (3DLUT bake from "
    "`core.icc.IccProfile`)", "pl_icc_decode", "pl_icc_encode")
yes("`core.icc.parse_icc` (self-contained binary parser; reference uses "
    "lcms2)", "pl_icc_open")
na("Python GC owns lifetimes", "pl_icc_close")
yes("`core.icc.IccProfile.signature` (crc32 content signature at parse "
    "time)", "pl_icc_profile_compute_signature")
yes("`core.icc.IccProfile.signature` comparison", "pl_icc_profile_equal")
design("profiles are immutable after parse; swapping `Target.icc` re-keys "
       "the jit cache (the reference mutates in place and re-bakes)",
       "pl_icc_update")
yes("`core.lut.parse_cube`", "pl_lut_parse_cube")
na("Python GC owns lifetimes", "pl_lut_free")
yes("`ops.lut.apply_lut` (exact tetrahedral + CP fast path)",
    "pl_shader_custom_lut")
yes("`render.hooks.Hook` (python callables at the 16 stages)",
    "pl_shader_custom")
yes("`render.mpv_hooks.parse_user_shader`", "pl_mpv_user_shader_parse")
na("Python GC owns lifetimes", "pl_mpv_user_shader_destroy")
yes("`render.hooks` output-size contract (size-changing passes rescale "
    "the ref grid)", "pl_shader_output_size")
yes("`ops.sampling.sample_nearest`", "pl_shader_sample_nearest")
yes("`ops.sampling.sample_bilinear`", "pl_shader_sample_bilinear")
yes("`ops.sampling.sample_oversample`", "pl_shader_sample_oversample")
design("the GPU linear-sampling trick is meaningless on TPU; bicubic/"
       "hermite/gaussian run as separable filters at full MXU speed "
       "(`ops.sampling.resize_separable` with the matching FilterConfig)",
       "pl_shader_sample_bicubic", "pl_shader_sample_hermite",
       "pl_shader_sample_gaussian")
design("\"direct\" sampling = the renderer's no-scaler fast path "
       "(sampler selection in `render/renderer.py`)",
       "pl_shader_sample_direct")
yes("`ops.sampling.sample_ortho` / `resize_separable`",
    "pl_shader_sample_ortho2")
yes("`ops.polar.sample_polar` (direct interleaved EWA + phased + LUT "
    "fallback)", "pl_shader_sample_polar")
yes("`ops.distort.distort` (affine warp + AA + alpha edge modes)",
    "pl_shader_distort")

# --- dispatch.h (Tier 3 collapses into jit) --------------------------------
design("XLA jit replaces GLSL assembly+caching: the Renderer traces one "
       "fused program per (frame, target, params) signature and LRU-caches "
       "the executables (`render/renderer.py` jit cache)",
       "pl_dispatch_create", "pl_dispatch_destroy", "pl_dispatch_begin",
       "pl_dispatch_finish", "pl_dispatch_compute", "pl_dispatch_abort",
       "pl_dispatch_reset_frame")
design("custom vertex geometry is a raster concept; overlays draw via "
       "masked composition (`render/renderer.py` draw_overlays analog)",
       "pl_dispatch_vertex")
yes("`render.renderer.Renderer.save` (persistent XLA compile cache + "
    "artifact cache)", "pl_dispatch_save")
yes("`render.renderer.Renderer.load`", "pl_dispatch_load")
yes("`render.profiler` + `runtime.Timer` (per-stage windows, "
    "non-blocking harvest)", "pl_dispatch_callback")

# --- shaders.h (Tier 2 builder collapses into traced composition) ----------
design("shaders are traced jnp functions; no text objects to manage",
       "pl_shader_alloc", "pl_shader_free", "pl_shader_reset",
       "pl_shader_is_failed", "pl_shader_is_compute", "pl_shader_info_ref",
       "pl_shader_info_deref", "pl_shader_obj_destroy")

# --- gpu.h / dummy.h (Tier 1 object model) ---------------------------------
design("buffers/textures are `jax.Array`s in HBM; formats are dtypes",
       "pl_buf_create", "pl_buf_destroy", "pl_buf_recreate", "pl_buf_write",
       "pl_buf_read", "pl_buf_copy", "pl_buf_export", "pl_buf_poll",
       "pl_tex_create", "pl_tex_destroy", "pl_tex_recreate",
       "pl_tex_invalidate", "pl_tex_poll",
       "pl_fmt_is_ordered", "pl_fmt_is_float", "pl_fmt_has_modifier",
       "pl_find_fmt", "pl_find_named_fmt", "pl_find_fourcc",
       "pl_find_vertex_fmt", "pl_plane_find_fmt")
yes("`utils.upload.upload_plane` (async `jax.device_put`)",
    "pl_tex_upload")
yes("`np.asarray(out)` / device fetch (async under jax dispatch)",
    "pl_tex_download")
yes("`render.renderer.clear_target`", "pl_tex_clear", "pl_tex_clear_ex")
yes("`ops.sampling.resize_separable` (a blit is a scaled copy)",
    "pl_tex_blit")
design("uniform/push-constant plumbing has no analog: traced closures "
       "bake constants, traced args carry per-frame data",
       "pl_var_float", "pl_var_int", "pl_var_uint", "pl_var_vec2",
       "pl_var_vec3", "pl_var_vec4", "pl_var_ivec2", "pl_var_ivec3",
       "pl_var_ivec4", "pl_var_uvec2", "pl_var_uvec3", "pl_var_uvec4",
       "pl_var_mat2", "pl_var_mat2x3", "pl_var_mat2x4", "pl_var_mat3",
       "pl_var_mat3x4", "pl_var_mat4", "pl_var_mat4x2", "pl_var_mat4x3",
       "pl_var_from_fmt", "pl_var_host_layout", "pl_var_type_size",
       "pl_std140_layout", "pl_std430_layout", "pl_desc_namespace",
       "pl_pass_create", "pl_pass_destroy", "pl_pass_run")
yes("`runtime.TpuContext.set_disk_cache` + `core.cache`", "pl_gpu_set_cache")
yes("`runtime.TpuContext.is_failed` (flag + `mark_failed`/`check_alive`)",
    "pl_gpu_is_failed")
design("`jax.block_until_ready` / async dispatch drains implicitly",
       "pl_gpu_finish", "pl_gpu_flush")
yes("`runtime.create_dummy` (CPU backend; the whole test suite runs on "
    "it with 8 virtual devices)", "pl_gpu_dummy_create")
na("Python GC owns lifetimes", "pl_gpu_dummy_destroy")
design("CPU-backend arrays are directly inspectable — no wrap needed",
       "pl_tex_dummy_create")
yes("`runtime.Timer` (non-blocking in-order query)", "pl_timer_create",
    "pl_timer_query")
na("Python GC owns lifetimes", "pl_timer_destroy")

# --- swapchain.h / vulkan.h / opengl.h / d3d11.h ---------------------------
na("no display attached to a TPU; the demo playback loop + frame queue "
   "play this role", "pl_swapchain_destroy", "pl_swapchain_latency",
   "pl_swapchain_resize", "pl_swapchain_colorspace_hint",
   "pl_swapchain_start_frame", "pl_swapchain_submit_frame",
   "pl_swapchain_swap_buffers")
na("Vulkan backend — XLA:TPU (axon) is the sole backend",
   "pl_vk_inst_create", "pl_vk_inst_destroy", "pl_vulkan_create",
   "pl_vulkan_destroy", "pl_vulkan_get", "pl_vulkan_choose_device",
   "pl_vulkan_create_swapchain", "pl_vulkan_swapchain_suboptimal",
   "pl_vulkan_import", "pl_vulkan_wrap", "pl_vulkan_unwrap",
   "pl_vulkan_hold_ex", "pl_vulkan_release_ex", "pl_vulkan_sem_create",
   "pl_vulkan_sem_destroy")
na("OpenGL backend — XLA:TPU (axon) is the sole backend",
   "pl_opengl_create", "pl_opengl_destroy", "pl_opengl_get",
   "pl_opengl_create_swapchain", "pl_opengl_swapchain_update_fb",
   "pl_opengl_wrap", "pl_opengl_unwrap")
na("D3D11 backend — XLA:TPU (axon) is the sole backend",
   "pl_d3d11_create", "pl_d3d11_destroy", "pl_d3d11_get",
   "pl_d3d11_create_swapchain", "pl_d3d11_wrap")

# --- stragglers -------------------------------------------------------------
yes("`utils.upload.chroma_location_offset`", "pl_chroma_location_offset")
yes("Python enum `.name` (`ColorPrimaries`/`ColorSystem`/`ColorTransfer` "
    "are named enums)", "pl_color_primaries_name", "pl_color_system_name",
    "pl_color_transfer_name")
yes("`core.colorspace.primaries_clip`", "pl_primaries_clip")
yes("`core.dither.find_error_diffusion_kernel`",
    "pl_find_error_diffusion_kernel")
yes("`core.filters.FilterFunction` dataclass equality",
    "pl_filter_function_eq")
yes("`core.filters.find_filter_config` (presets resolve through the same "
    "named-config table)", "pl_find_filter_config", "pl_find_filter_preset")
yes("`core.filters.find_filter_function`", "pl_find_filter_function",
    "pl_find_filter_function_preset")
yes("`core.gamut_mapping.find_gamut_map_function`",
    "pl_find_gamut_map_function")
yes("`core.tone_mapping.find_tone_map_function`",
    "pl_find_tone_map_function")
yes("`render.queue.frame_mix_current`", "pl_frame_mix_current")
yes("`render.queue.frame_mix_nearest`", "pl_frame_mix_nearest")
design("shaders are traced jnp functions; jit trace is the finalize",
       "pl_shader_finalize")
design("CPU-backend arrays are directly inspectable — no unwrap needed",
       "pl_buf_dummy_data", "pl_tex_dummy_data")
na("D3D11 backend — XLA:TPU (axon) is the sole backend",
   "pl_d3d11_swapchain_unwrap")
design("no GLSL text exists to name types for",
       "pl_desc_access_glsl_name", "pl_var_glsl_type_name")

# --- interop headers (libav / dav1d) ---------------------------------------
_LIBAV = ("`utils.interop` AVFrame mapping (`frame_from_avframe_like`, "
          "`frame_from_pyav`, side data incl. HDR10/HDR10+/DV/grain)")
_DAV1D = "`utils.interop.frame_from_dav1d_picture_like`"


def classify_prefix(sym: str):
    """Fallbacks for interop headers whose symbols are enumerated
    dynamically."""
    if sym.startswith(("pl_frame_from_avframe", "pl_frame_to_avframe",
                       "pl_map_avframe", "pl_unmap_avframe",
                       "pl_avframe_", "pl_frame_recreate_from_avframe",
                       "pl_frame_copy_stream_props", "pl_map_dovi_metadata",
                       "pl_map_hdr_metadata", "pl_upload_avframe",
                       "pl_download_avframe", "pl_test_pixfmt",
                       "pl_plane_data_from_pixfmt", "pl_swapchain_fmt_from")):
        return ("yes", _LIBAV)
    if "dav1d" in sym:
        return ("yes", _DAV1D)
    if sym.startswith(("pl_color_system_from_av", "pl_color_levels_from_av",
                       "pl_primaries_from_av", "pl_transfer_from_av",
                       "pl_chroma_from_av", "pl_color_space_from_av",
                       "pl_color_repr_from_av",
                       "pl_system_from_av", "pl_levels_from_av")):
        return ("yes", "`utils.interop` enum mapping tables")
    return None


# ---------------------------------------------------------------------------
# generation
# ---------------------------------------------------------------------------

def enumerate_symbols():
    per_header = OrderedDict()
    headers = []
    for root, _dirs, files in os.walk(REF):
        for f in sorted(files):
            if f.endswith(".h"):
                headers.append(os.path.join(root, f))
    headers.sort(key=lambda p: os.path.relpath(p, REF))
    pat = re.compile(r"PL_API[^;(]*?\b(pl_[a-z_0-9]+)\s*\(")
    for h in headers:
        text = open(h, errors="replace").read()
        # strip comments so documented-but-nonexistent names don't count
        text = re.sub(r"//[^\n]*", "", text)
        text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
        syms = sorted(set(pat.findall(text)))
        if syms:
            per_header[os.path.relpath(h, REF)] = syms
    return per_header


def verify_yes_targets(mapping_used):
    """Best-effort: every `module.symbol`-looking backtick target must
    grep somewhere in the repo."""
    src_dirs = [os.path.join(REPO, "libplacebo_tpu"),
                os.path.join(REPO, "tools")]
    blob = []
    for d in src_dirs:
        for root, _dirs, files in os.walk(d):
            for f in files:
                if f.endswith(".py"):
                    blob.append(open(os.path.join(root, f),
                                     errors="replace").read())
    blob = "\n".join(blob)
    bad = []
    for sym, (status, analog) in sorted(mapping_used.items()):
        if status != "yes":
            continue
        for target in re.findall(r"`([a-zA-Z_0-9.]+)`", analog):
            last = target.split(".")[-1]
            if last in ("asarray",):   # external
                continue
            if not re.search(r"\b" + re.escape(last) + r"\b", blob):
                bad.append((sym, target))
    return bad


def main():
    per_header = enumerate_symbols()
    lines = [
        "# API parity map — reference public symbols → libplacebo_tpu",
        "",
        "Generated by `tools/api_parity.py` (re-run after API changes; "
        "`--check` verifies every named analog exists). One row per "
        "`PL_API` function in the reference headers.",
        "",
        "Status: **yes** = direct analog · **design** = collapsed by the "
        "TPU-first design (the capability exists, the mechanism differs) "
        "· **n/a** = no meaningful TPU counterpart.",
        "",
    ]
    counts = {"yes": 0, "design": 0, "n/a": 0, "unmapped": 0}
    mapping_used = {}
    unmapped = []
    seen = set()
    for header, syms in per_header.items():
        rows = []
        for s in syms:
            if s in seen:
                continue
            seen.add(s)
            ent = M.get(s) or classify_prefix(s)
            if ent is None:
                unmapped.append((header, s))
                counts["unmapped"] += 1
                rows.append((s, "??", "**UNMAPPED**"))
                continue
            status, analog = ent
            counts[status] += 1
            mapping_used[s] = ent
            rows.append((s, status, analog))
        if not rows:
            continue
        lines.append(f"## `{header}`")
        lines.append("")
        lines.append("| symbol | status | TPU analog |")
        lines.append("|---|---|---|")
        for s, status, analog in rows:
            lines.append(f"| `{s}` | {status} | {analog} |")
        lines.append("")
    total = sum(counts.values())
    lines.insert(4, f"**{total} symbols: {counts['yes']} direct, "
                    f"{counts['design']} by-design, {counts['n/a']} n/a"
                    + (f", {counts['unmapped']} UNMAPPED"
                       if counts["unmapped"] else "") + ".**")
    lines.insert(5, "")

    bad = verify_yes_targets(mapping_used)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {OUT}: {total} symbols "
          f"({counts['yes']} yes / {counts['design']} design / "
          f"{counts['n/a']} n/a / {counts['unmapped']} unmapped)")
    ok = True
    if unmapped:
        ok = False
        print("UNMAPPED symbols:")
        for h, s in unmapped:
            print(f"  {h}: {s}")
    if bad:
        ok = False
        print("DANGLING analogs (named but not found in repo):")
        for s, t in bad:
            print(f"  {s} -> {t}")
    if "--check" in sys.argv and not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
