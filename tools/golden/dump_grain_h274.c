/* Golden-vector dumper for H.274 (SMPTE RDD-5) film-grain synthesis.
 *
 * Includes the reference's film_grain_h274.c directly to reach its
 * static generate_slice (film_grain_h274.c:34-105) and the committed
 * Gaussian_LUT / Seed_LUT / R64T constant tables.  Built with
 * -ffunction-sections + --gc-sections so the shader-machinery functions
 * we never call are discarded before their GPU symbols need resolving.
 */
#include <stdio.h>
#include <stdlib.h>

#include "shaders/film_grain_h274.c"

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
    out = fopen(argc > 1 ? argv[1] : "grain_h274.bin", "wb");
    if (!out)
        return 1;

    static const int hv[][2] = {{0, 0}, {1, 2}, {6, 6}, {12, 12},
                                {2, 12}, {12, 0}};
    static int8_t grain[64][64];
    static int16_t tmp[64][64];
    static float slice[64 * 64];
    for (size_t i = 0; i < sizeof(hv) / sizeof(hv[0]); i++) {
        generate_slice(slice, 64, (uint8_t) hv[i][0], (uint8_t) hv[i][1],
                       grain, tmp);
        char name[64];
        snprintf(name, sizeof(name), "grain_h274_slice_%d_%d",
                 hv[i][0], hv[i][1]);
        dump(name, slice, 2, (const int[]){64, 64});
    }

    fclose(out);
    return 0;
}
