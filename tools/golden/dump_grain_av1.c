/* Golden-vector dumper for AV1 film-grain synthesis.
 *
 * Includes the reference's film_grain_av1.c directly to reach its
 * static table generators (generate_grain_y:303, generate_grain_uv:351,
 * generate_offsets:434, generate_scaling:464) — the CPU-side math the
 * GPU shader samples.  Built with -ffunction-sections + --gc-sections
 * so the shader-machinery functions we never call are discarded before
 * their GPU symbols need resolving.
 *
 * Parameters mirror tests/test_film_grain.py's GRAIN/DATA fixture so
 * the Python + native C++ implementations can be asserted bit-exact.
 */
#include <stdio.h>
#include <stdlib.h>

#include "shaders/film_grain_av1.c"

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

int main(int argc, char **argv)
{
    out = fopen(argc > 1 ? argv[1] : "grain_av1.bin", "wb");
    if (!out)
        return 1;

    /* tests/test_film_grain.py GRAIN fixture */
    struct pl_av1_grain_data av1 = {
        .num_points_y = 6,
        .points_y = {{0, 4}, {20, 5}, {39, 5}, {59, 5}, {78, 5}, {255, 40}},
        .chroma_scaling_from_luma = false,
        .num_points_uv = {2, 2},
        .points_uv = {{{0, 8}, {255, 18}}, {{0, 6}, {255, 14}}},
        .scaling_shift = 11,
        .ar_coeff_lag = 3,
        .ar_coeffs_y = {10, 18, -29, 18, -2, 0, 7, -13, 28, -27, -14, -7,
                        4, -6, -23, -28, -30, -28, -22, 29, -19, 9, 15, -16},
        .ar_coeffs_uv = {
            {-3, 1, 0, -7, 17, -6, 6, -6, -3, 19, -13, 5, -3, 6, 10, -7,
             6, 7, -2, -16, 4, -18, 15, 14, 13},
            {17, 5, 7, 15, 3, 11, 13, -11, -18, -8, -9, 14, 16, -20, -1,
             12, -15, 11, -16, -2, 12, -8, -7, -9, 8},
        },
        .ar_coeff_shift = 7,
        .grain_scale_shift = 0,
        .uv_mult = {64, 64},
        .uv_mult_luma = {32, 32},
        .uv_offset = {0, 0},
        .overlap = true,
    };
    struct pl_color_repr repr = {
        .sys = PL_COLOR_SYSTEM_BT_709,
        .levels = PL_COLOR_LEVELS_LIMITED,
        .bits = {.color_depth = 8, .sample_depth = 8},
    };
    struct pl_film_grain_params params = {
        .data = {
            .type = PL_FILM_GRAIN_AV1,
            .seed = 7391,
            .params.av1 = av1,
        },
        .repr = &repr,
    };

    static float lut_y[GRAIN_HEIGHT_LUT][GRAIN_WIDTH_LUT];
    static int16_t buf_y[GRAIN_HEIGHT][GRAIN_WIDTH];
    generate_grain_y(lut_y, buf_y, &params);
    dump("grain_av1_lut_y", &lut_y[0][0], 2,
         (const int[]){GRAIN_HEIGHT_LUT, GRAIN_WIDTH_LUT});

    /* chroma at 4:2:0 (sub_x = sub_y = 1) and 4:4:4 (0, 0) */
    static float lut_uv[GRAIN_HEIGHT_LUT * GRAIN_WIDTH_LUT];
    static int16_t buf_uv[GRAIN_HEIGHT][GRAIN_WIDTH];
    for (int ch = 1; ch <= 2; ch++) {
        generate_grain_uv(lut_uv, buf_uv, buf_y, (enum pl_channel) ch,
                          1, 1, &params);
        char name[64];
        snprintf(name, sizeof(name), "grain_av1_lut_uv%d_420", ch);
        dump(name, lut_uv, 2, (const int[]){SUB_GRAIN_HEIGHT_LUT,
                                            SUB_GRAIN_WIDTH_LUT});
        generate_grain_uv(lut_uv, buf_uv, buf_y, (enum pl_channel) ch,
                          0, 0, &params);
        snprintf(name, sizeof(name), "grain_av1_lut_uv%d_444", ch);
        dump(name, lut_uv, 2, (const int[]){GRAIN_HEIGHT_LUT,
                                            GRAIN_WIDTH_LUT});
    }

    /* packed per-block offsets, 24x16 blocks (float-encoded uint32) */
    enum { OW = 24, OH = 16 };
    static unsigned int offsets[OH * OW];
    struct sh_lut_params olp = {
        .width = OW, .height = OH, .priv = &params.data,
    };
    generate_offsets(offsets, &olp);
    /* a packed uint32 is not exactly representable in f32 — dump the
     * four 8-bit fields (tl, t, l, n) as separate exact planes */
    static float offsets_f[4][OH * OW];
    for (int i = 0; i < OH * OW; i++) {
        offsets_f[0][i] = (float) ((offsets[i] >> OFFSET_TL) & 0xFF);
        offsets_f[1][i] = (float) ((offsets[i] >> OFFSET_T) & 0xFF);
        offsets_f[2][i] = (float) ((offsets[i] >> OFFSET_L) & 0xFF);
        offsets_f[3][i] = (float) ((offsets[i] >> OFFSET_N) & 0xFF);
    }
    dump("grain_av1_offsets_24x16", &offsets_f[0][0], 3,
         (const int[]){4, OH, OW});

    /* scaling LUTs for the y and uv point sets */
    struct {
        int num;
        const uint8_t (*points)[2];
        const struct pl_av1_grain_data *data;
    } sctx = {av1.num_points_y, av1.points_y, &av1};
    static float scaling[SCALING_LUT_SIZE];
    struct sh_lut_params slp = {
        .width = SCALING_LUT_SIZE, .comps = 1, .priv = &sctx,
    };
    generate_scaling(scaling, &slp);
    dump("grain_av1_scaling_y", scaling, 1, (const int[]){SCALING_LUT_SIZE});
    sctx.num = av1.num_points_uv[0];
    sctx.points = av1.points_uv[0];
    generate_scaling(scaling, &slp);
    dump("grain_av1_scaling_u", scaling, 1, (const int[]){SCALING_LUT_SIZE});

    fclose(out);
    return 0;
}
