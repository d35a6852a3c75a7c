/* Golden-vector dumper: compiles the reference's GPU-independent Tier 0
 * (tone_mapping.c, filters.c, gamut_mapping.c, colorspace.c, dither.c)
 * and samples curves/matrices/LUTs for a fixed parameter grid. The
 * output binary is converted to tests/golden/reference_golden.npz and
 * committed; tests/test_golden_reference.py asserts the Python
 * implementations match (BASELINE.md fidelity target).
 *
 * Record format per array: "name f32 ndim d0 d1 ...\n" + raw LE floats.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#include <libplacebo/tone_mapping.h>
#include <libplacebo/filters.h>
#include <libplacebo/gamut_mapping.h>
#include <libplacebo/colorspace.h>
#include <libplacebo/dither.h>

static FILE *out;

static void dump(const char *name, const float *data, int ndim,
                 const int *dims)
{
    long total = 1;
    fprintf(out, "%s f32 %d", name, ndim);
    for (int i = 0; i < ndim; i++) {
        fprintf(out, " %d", dims[i]);
        total *= dims[i];
    }
    fprintf(out, "\n");
    fwrite(data, sizeof(float), total, out);
}

static void dump1(const char *name, const float *data, int n)
{
    dump(name, data, 1, &n);
}

/* ---- tone mapping curves (src/tone_mapping.c) ---- */
static void dump_tone(void)
{
    static const struct pl_tone_map_function *funcs[] = {
        &pl_tone_map_clip, &pl_tone_map_spline, &pl_tone_map_st2094_40,
        &pl_tone_map_st2094_10, &pl_tone_map_bt2390, &pl_tone_map_bt2446a,
        &pl_tone_map_reinhard, &pl_tone_map_mobius, &pl_tone_map_hable,
        &pl_tone_map_gamma, &pl_tone_map_linear, &pl_tone_map_linear_light,
    };
    const int N = 256;
    float lut[256];
    for (size_t i = 0; i < sizeof(funcs) / sizeof(funcs[0]); i++) {
        struct pl_tone_map_params p = {
            .function = funcs[i],
            .input_scaling = PL_HDR_PQ,
            .output_scaling = PL_HDR_PQ,
            .lut_size = N,
            .input_min = pl_hdr_rescale(PL_HDR_NITS, PL_HDR_PQ, 0.005f),
            .input_max = pl_hdr_rescale(PL_HDR_NITS, PL_HDR_PQ, 1000.0f),
            .output_min = pl_hdr_rescale(PL_HDR_NITS, PL_HDR_PQ, 0.2030f),
            .output_max = pl_hdr_rescale(PL_HDR_NITS, PL_HDR_PQ, 203.0f),
            .constants = {PL_TONE_MAP_CONSTANTS},
        };
        pl_tone_map_params_infer(&p);
        pl_tone_map_generate(lut, &p);
        char name[128];
        snprintf(name, sizeof(name), "tone_%s", funcs[i]->name);
        dump1(name, lut, N);
    }

    /* a second grid: 4000 nits -> 100 nits (extreme compression) */
    for (size_t i = 0; i < sizeof(funcs) / sizeof(funcs[0]); i++) {
        struct pl_tone_map_params p = {
            .function = funcs[i],
            .input_scaling = PL_HDR_PQ,
            .output_scaling = PL_HDR_PQ,
            .lut_size = N,
            .input_min = pl_hdr_rescale(PL_HDR_NITS, PL_HDR_PQ, 0.005f),
            .input_max = pl_hdr_rescale(PL_HDR_NITS, PL_HDR_PQ, 4000.0f),
            .output_min = pl_hdr_rescale(PL_HDR_NITS, PL_HDR_PQ, 0.1f),
            .output_max = pl_hdr_rescale(PL_HDR_NITS, PL_HDR_PQ, 100.0f),
            .constants = {PL_TONE_MAP_CONSTANTS},
        };
        pl_tone_map_params_infer(&p);
        pl_tone_map_generate(lut, &p);
        char name[128];
        snprintf(name, sizeof(name), "tone4k_%s", funcs[i]->name);
        dump1(name, lut, N);
    }
}

/* ---- filter kernels (src/filters.c) ---- */
static void dump_filters(void)
{
    static const struct {
        const char *name;
        const struct pl_filter_config *cfg;
    } configs[] = {
        {"bilinear", &pl_filter_bilinear},
        {"spline16", &pl_filter_spline16},
        {"spline36", &pl_filter_spline36},
        {"spline64", &pl_filter_spline64},
        {"lanczos", &pl_filter_lanczos},
        {"ewa_lanczos", &pl_filter_ewa_lanczos},
        {"ewa_lanczossharp", &pl_filter_ewa_lanczossharp},
        {"ewa_jinc", &pl_filter_ewa_jinc},
        {"bicubic", &pl_filter_bicubic},
        {"hermite", &pl_filter_hermite},
        {"mitchell", &pl_filter_mitchell},
        {"catmull_rom", &pl_filter_catmull_rom},
        {"robidoux", &pl_filter_robidoux},
        {"gaussian", &pl_filter_gaussian},
        {"sinc", &pl_filter_sinc},
        {"ginseng", &pl_filter_ginseng},
        {"ewa_hann", &pl_filter_ewa_hann},
        {"ewa_ginseng", &pl_filter_ewa_ginseng},
    };
    const int N = 512;
    float w[512];
    for (size_t i = 0; i < sizeof(configs) / sizeof(configs[0]); i++) {
        double radius = configs[i].cfg->radius ? configs[i].cfg->radius
                        : configs[i].cfg->kernel->radius;
        for (int k = 0; k < N; k++) {
            double x = radius * k / (double)(N - 1);
            w[k] = (float)pl_filter_sample(configs[i].cfg, x);
        }
        char name[128];
        snprintf(name, sizeof(name), "filter_%s", configs[i].name);
        dump1(name, w, N);
        float r = (float)radius;
        dump1((snprintf(name, sizeof(name), "filter_%s_radius",
                        configs[i].name), name), &r, 1);
    }
}

/* ---- YUV decode + primaries matrices (src/colorspace.c) ---- */
static void dump_matrices(void)
{
    struct {
        const char *name;
        struct pl_color_repr repr;
    } cases[] = {
        {"decode_bt709_lim8", {
            .sys = PL_COLOR_SYSTEM_BT_709, .levels = PL_COLOR_LEVELS_LIMITED,
            .bits = {.sample_depth = 8, .color_depth = 8}}},
        {"decode_bt2020nc_lim10", {
            .sys = PL_COLOR_SYSTEM_BT_2020_NC,
            .levels = PL_COLOR_LEVELS_LIMITED,
            .bits = {.sample_depth = 10, .color_depth = 10}}},
        {"decode_bt601_full8", {
            .sys = PL_COLOR_SYSTEM_BT_601, .levels = PL_COLOR_LEVELS_FULL,
            .bits = {.sample_depth = 8, .color_depth = 8}}},
        {"decode_rgb_lim16", {
            .sys = PL_COLOR_SYSTEM_RGB, .levels = PL_COLOR_LEVELS_LIMITED,
            .bits = {.sample_depth = 16, .color_depth = 16}}},
        {"decode_ictcp_pq_full10", {
            .sys = PL_COLOR_SYSTEM_BT_2100_PQ,
            .levels = PL_COLOR_LEVELS_FULL,
            .bits = {.sample_depth = 10, .color_depth = 10}}},
        {"decode_ycgco_full8", {
            .sys = PL_COLOR_SYSTEM_YCGCO, .levels = PL_COLOR_LEVELS_FULL,
            .bits = {.sample_depth = 8, .color_depth = 8}}},
    };
    for (size_t i = 0; i < sizeof(cases) / sizeof(cases[0]); i++) {
        struct pl_color_repr repr = cases[i].repr;
        struct pl_transform3x3 tr = pl_color_repr_decode(&repr, NULL);
        float buf[12];
        memcpy(buf, tr.mat.m, 9 * sizeof(float));
        memcpy(buf + 9, tr.c, 3 * sizeof(float));
        int dims[1] = {12};
        dump(cases[i].name, buf, 1, dims);
    }

    /* color adjustment folded into the decode matrix
     * (pl_color_adjustment, colorspace.c:1703-1812) */
    {
        struct pl_color_repr repr = {
            .sys = PL_COLOR_SYSTEM_BT_709,
            .levels = PL_COLOR_LEVELS_LIMITED,
            .bits = {.sample_depth = 8, .color_depth = 8},
        };
        struct pl_color_adjustment adj = {
            .brightness = 0.05f, .contrast = 0.9f, .saturation = 1.4f,
            .hue = 0.5f, .gamma = 1.0f, .temperature = 0.6f,
        };
        struct pl_transform3x3 tr = pl_color_repr_decode(&repr, &adj);
        float buf[12];
        memcpy(buf, tr.mat.m, 9 * sizeof(float));
        memcpy(buf + 9, tr.c, 3 * sizeof(float));
        int dims[1] = {12};
        dump("decode_bt709_lim8_adjusted", buf, 1, dims);
    }
    {
        struct pl_color_repr repr = {
            .sys = PL_COLOR_SYSTEM_RGB,
            .levels = PL_COLOR_LEVELS_FULL,
            .bits = {.sample_depth = 8, .color_depth = 8},
        };
        struct pl_color_adjustment adj = {
            .brightness = -0.1f, .contrast = 1.2f, .saturation = 0.7f,
            .hue = -0.8f, .gamma = 1.0f, .temperature = -0.4f,
        };
        struct pl_transform3x3 tr = pl_color_repr_decode(&repr, &adj);
        float buf[12];
        memcpy(buf, tr.mat.m, 9 * sizeof(float));
        memcpy(buf + 9, tr.c, 3 * sizeof(float));
        int dims[1] = {12};
        dump("decode_rgb_full8_adjusted", buf, 1, dims);
    }

    struct {
        const char *name;
        enum pl_color_primaries src, dst;
    } prims[] = {
        {"prim_709_to_2020", PL_COLOR_PRIM_BT_709, PL_COLOR_PRIM_BT_2020},
        {"prim_2020_to_709", PL_COLOR_PRIM_BT_2020, PL_COLOR_PRIM_BT_709},
        {"prim_dcip3_to_709", PL_COLOR_PRIM_DISPLAY_P3,
         PL_COLOR_PRIM_BT_709},
        {"prim_2020_to_dcip3", PL_COLOR_PRIM_BT_2020,
         PL_COLOR_PRIM_DISPLAY_P3},
    };
    for (size_t i = 0; i < sizeof(prims) / sizeof(prims[0]); i++) {
        struct pl_matrix3x3 m = pl_get_color_mapping_matrix(
            pl_raw_primaries_get(prims[i].src),
            pl_raw_primaries_get(prims[i].dst),
            PL_INTENT_RELATIVE_COLORIMETRIC);
        int dims[2] = {3, 3};
        dump(prims[i].name, &m.m[0][0], 2, dims);
    }

    /* PQ/HLG scaling curves via pl_hdr_rescale */
    const int N = 256;
    float pq2nits[256], nits2pq[256];
    for (int k = 0; k < N; k++) {
        float x = k / (float)(N - 1);
        pq2nits[k] = pl_hdr_rescale(PL_HDR_PQ, PL_HDR_NITS, x);
        nits2pq[k] = pl_hdr_rescale(PL_HDR_NITS, PL_HDR_PQ,
                                    10000.0f * x * x);
    }
    dump1("hdr_pq_to_nits", pq2nits, N);
    dump1("hdr_nits_to_pq_sq", nits2pq, N);
}

/* ---- gamut mapping (src/gamut_mapping.c) ---- */
static void dump_gamut(void)
{
    static const struct pl_gamut_map_function *funcs[] = {
        &pl_gamut_map_clip, &pl_gamut_map_perceptual,
        &pl_gamut_map_softclip, &pl_gamut_map_relative,
        &pl_gamut_map_saturation, &pl_gamut_map_absolute,
        &pl_gamut_map_desaturate, &pl_gamut_map_darken,
        &pl_gamut_map_highlight, &pl_gamut_map_linear,
    };
    const int NI = 9, NC = 7, NH = 16;
    float min_luma = pl_hdr_rescale(PL_HDR_NITS, PL_HDR_PQ, 0.2030f);
    float max_luma = pl_hdr_rescale(PL_HDR_NITS, PL_HDR_PQ, 203.0f);
    static float samples[9 * 7 * 16 * 3];
    for (size_t f = 0; f < sizeof(funcs) / sizeof(funcs[0]); f++) {
        struct pl_gamut_map_params p = {
            .function = funcs[f],
            .input_gamut = *pl_raw_primaries_get(PL_COLOR_PRIM_BT_2020),
            .output_gamut = *pl_raw_primaries_get(PL_COLOR_PRIM_BT_709),
            .min_luma = min_luma,
            .max_luma = max_luma,
            .constants = {PL_GAMUT_MAP_CONSTANTS},
        };
        int idx = 0;
        for (int i = 0; i < NI; i++)
        for (int c = 0; c < NC; c++)
        for (int h = 0; h < NH; h++) {
            float I = min_luma + (max_luma - min_luma) * i / (NI - 1);
            float C = 0.5f * c / (NC - 1);
            float H = -3.14159265f + 2 * 3.14159265f * h / (float)NH;
            float x[3] = {I, C * cosf(H), C * sinf(H)};
            pl_gamut_map_sample(x, &p);
            samples[idx++] = x[0];
            samples[idx++] = x[1];
            samples[idx++] = x[2];
        }
        char name[128];
        snprintf(name, sizeof(name), "gamut_%s", funcs[f]->name);
        int dims[4] = {NI, NC, NH, 3};
        dump(name, samples, 4, dims);
    }
}

/* ---- dither matrices (src/dither.c) ---- */
static void dump_dither(void)
{
    static float bayer[16 * 16];
    pl_generate_bayer_matrix(bayer, 16);
    int dims[2] = {16, 16};
    dump("bayer_16", bayer, 2, dims);
}

/* ---- primaries clipping + nominal luma (src/colorspace.c) ---- */
static void dump_clip_luma(void)
{
    const struct pl_raw_primaries *p2020 =
        pl_raw_primaries_get(PL_COLOR_PRIM_BT_2020);
    const struct pl_raw_primaries *p709 =
        pl_raw_primaries_get(PL_COLOR_PRIM_BT_709);
    const struct pl_raw_primaries *dci =
        pl_raw_primaries_get(PL_COLOR_PRIM_DCI_P3);

    const struct pl_raw_primaries *pairs[][2] = {
        {p709, p2020}, {p2020, p709}, {dci, p2020}, {p2020, dci},
        {p709, dci},
    };
    float buf[5][8];
    for (int i = 0; i < 5; i++) {
        struct pl_raw_primaries c = pl_primaries_clip(pairs[i][0],
                                                      pairs[i][1]);
        buf[i][0] = c.red.x;   buf[i][1] = c.red.y;
        buf[i][2] = c.green.x; buf[i][3] = c.green.y;
        buf[i][4] = c.blue.x;  buf[i][5] = c.blue.y;
        buf[i][6] = c.white.x; buf[i][7] = c.white.y;
    }
    int dims[2] = {5, 8};
    dump("primaries_clip", (float *) buf, 2, dims);

    /* nominal luma with metadata tier selection */
    struct pl_color_space csp = {
        .primaries = PL_COLOR_PRIM_BT_2020,
        .transfer = PL_COLOR_TRC_PQ,
        .hdr = {
            .min_luma = 0.005f,
            .max_luma = 4000.0f,
            .max_cll = 3500.0f,
            .scene_max = {2000.0f, 2100.0f, 1900.0f},
            .scene_avg = 300.0f,
            .max_pq_y = 0.8f,
            .avg_pq_y = 0.4f,
        },
    };
    static const enum pl_hdr_metadata_type metas[] = {
        PL_HDR_METADATA_ANY, PL_HDR_METADATA_NONE,
        PL_HDR_METADATA_HDR10, PL_HDR_METADATA_HDR10PLUS,
        PL_HDR_METADATA_CIE_Y,
    };
    float luma[5][3];
    for (int i = 0; i < 5; i++) {
        float mn = 0, mx = 0, avg = 0;
        pl_color_space_nominal_luma_ex(pl_nominal_luma_params(
            .color = &csp,
            .metadata = metas[i],
            .scaling = PL_HDR_NITS,
            .out_min = &mn, .out_max = &mx, .out_avg = &avg,
        ));
        luma[i][0] = mn; luma[i][1] = mx; luma[i][2] = avg;
    }
    int ldims[2] = {5, 3};
    dump("nominal_luma", (float *) luma, 2, ldims);
}

/* ---- white point loci + joint colorspace inference ---- */
static void dump_whitepoints_infer(void)
{
    /* blackbody/daylight/white loci over a temperature grid (incl.
     * values outside the clamp ranges to pin clamping too) */
    enum { N = 25 };
    float wp[N][6];
    for (int i = 0; i < N; i++) {
        float t = 1500.0f + i * 1000.0f;
        struct pl_cie_xy b = pl_blackbody_from_temp(t);
        struct pl_cie_xy d = pl_daylight_from_temp(t);
        struct pl_cie_xy w = pl_white_from_temp(t);
        wp[i][0] = b.x; wp[i][1] = b.y;
        wp[i][2] = d.x; wp[i][3] = d.y;
        wp[i][4] = w.x; wp[i][5] = w.y;
    }
    int dims[2] = {N, 6};
    dump("white_points", (float *) wp, 2, dims);

    /* pl_color_space_infer_map over pairs covering each branch:
     * HDR->unknown, HLG->HDR peak tune, BT.1886 src adopting dst
     * black, SDR->SDR reverse black share, black-scaled src share */
    struct pl_color_space pairs[][2] = {
        {{ .primaries = PL_COLOR_PRIM_BT_2020,
           .transfer = PL_COLOR_TRC_PQ }, {0}},
        {{ .primaries = PL_COLOR_PRIM_BT_2020,
           .transfer = PL_COLOR_TRC_HLG },
         { .primaries = PL_COLOR_PRIM_BT_2020,
           .transfer = PL_COLOR_TRC_PQ,
           .hdr = { .max_luma = 800.0f } }},
        {{ .primaries = PL_COLOR_PRIM_BT_709,
           .transfer = PL_COLOR_TRC_BT_1886 },
         { .primaries = PL_COLOR_PRIM_BT_709,
           .transfer = PL_COLOR_TRC_SRGB,
           .hdr = { .min_luma = 0.05f, .max_luma = 100.0f } }},
        {{ .primaries = PL_COLOR_PRIM_BT_709,
           .transfer = PL_COLOR_TRC_BT_1886,
           .hdr = { .min_luma = 0.1f, .max_luma = 100.0f } }, {0}},
        {{ .primaries = PL_COLOR_PRIM_BT_709,
           .transfer = PL_COLOR_TRC_SRGB },
         { .primaries = PL_COLOR_PRIM_BT_709,
           .transfer = PL_COLOR_TRC_BT_1886,
           .hdr = { .min_luma = 0.2f, .max_luma = 250.0f } }},
    };
    enum { NP = sizeof(pairs) / sizeof(pairs[0]) };
    float im[NP][4];
    for (int i = 0; i < NP; i++) {
        struct pl_color_space s = pairs[i][0], d = pairs[i][1];
        pl_color_space_infer_map(&s, &d);
        im[i][0] = s.hdr.min_luma; im[i][1] = s.hdr.max_luma;
        im[i][2] = d.hdr.min_luma; im[i][3] = d.hdr.max_luma;
    }
    int idims[2] = {NP, 4};
    dump("infer_map_luma", (float *) im, 2, idims);
}

int main(int argc, char **argv)
{
    out = fopen(argc > 1 ? argv[1] : "golden.bin", "wb");
    if (!out)
        return 1;
    dump_tone();
    dump_filters();
    dump_matrices();
    dump_gamut();
    dump_dither();
    dump_clip_luma();
    dump_whitepoints_infer();
    fclose(out);
    return 0;
}
