/* Standalone C host exercising the native API end-to-end: proves the
 * library embeds the interpreter and runs a full VB fit with no Python
 * on the host side. Mirrors the reference binding flow
 * (py/fabber.py:634-713) from C. */

#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define NX 4
#define NY 3
#define NZ 2
#define NT 16
#define NV (NX * NY * NZ)

extern void *fabber_new(char *err_buf);
extern void fabber_destroy(void *fab);
extern int fabber_set_extent(void *fab, unsigned nx, unsigned ny, unsigned nz,
    const int *mask, char *err_buf);
extern int fabber_set_opt(void *fab, const char *key, const char *value,
    char *err_buf);
extern int fabber_set_data(void *fab, const char *name, unsigned data_size,
    const float *data, char *err_buf);
extern int fabber_dorun(void *fab, unsigned log_bufsize, char *log_buf,
    char *err_buf, void (*progress_cb)(int, int));
extern int fabber_get_data_size(void *fab, const char *name, char *err_buf);
extern int fabber_get_data(void *fab, const char *name, float *buf,
    char *err_buf);
extern int fabber_get_models(void *fab, unsigned bufsize, char *buf,
    char *err_buf);

static int progress_calls = 0;
static void on_progress(int voxel, int total)
{
    (void)voxel;
    (void)total;
    progress_calls++;
}

#define CHECK(expr)                                                            \
    do                                                                         \
    {                                                                          \
        int rc_ = (expr);                                                      \
        if (rc_ < 0)                                                           \
        {                                                                      \
            fprintf(stderr, "FAIL: %s -> %d (%s)\n", #expr, rc_, err);         \
            return 1;                                                          \
        }                                                                      \
    } while (0)

int main(void)
{
    char err[256] = { 0 };
    char buf[4096] = { 0 };
    static char logbuf[1 << 20];

    void *fab = fabber_new(err);
    if (!fab)
    {
        fprintf(stderr, "FAIL: fabber_new: %s\n", err);
        return 1;
    }

    CHECK(fabber_get_models(fab, sizeof(buf), buf, err));
    if (!strstr(buf, "poly"))
    {
        fprintf(stderr, "FAIL: poly not in models: %s\n", buf);
        return 1;
    }

    CHECK(fabber_set_extent(fab, NX, NY, NZ, NULL, err));
    CHECK(fabber_set_opt(fab, "model", "poly", err));
    CHECK(fabber_set_opt(fab, "degree", "1", err));
    CHECK(fabber_set_opt(fab, "method", "vb", err));
    CHECK(fabber_set_opt(fab, "noise", "white", err));
    CHECK(fabber_set_opt(fab, "max-iterations", "8", err));
    CHECK(fabber_set_opt(fab, "save-mean", "", err));
    CHECK(fabber_set_opt(fab, "save-noise-mean", "", err));

    /* phantom: y = 2 + 0.5*t + small deterministic ripple */
    static float data[NV * NT];
    for (int t = 0; t < NT; t++)
        for (int v = 0; v < NV; v++)
            data[t * NV + v]
                = 2.0f + 0.5f * (t + 1) + 0.05f * sinf(v + t * 1.7f);
    CHECK(fabber_set_data(fab, "data", NT, data, err));

    CHECK(fabber_dorun(fab, sizeof(logbuf), logbuf, err, on_progress));

    int size = fabber_get_data_size(fab, "mean_c1", err);
    CHECK(size);
    static float mean_c1[NV];
    CHECK(fabber_get_data(fab, "mean_c1", mean_c1, err));

    double sum = 0;
    for (int v = 0; v < NV; v++)
        sum += mean_c1[v];
    double avg = sum / NV;
    printf("mean_c1 avg = %.4f (true 0.5), progress calls = %d\n", avg,
        progress_calls);
    if (fabs(avg - 0.5) > 0.02 || progress_calls < 2)
    {
        fprintf(stderr, "FAIL: wrong recovery or no progress callbacks\n");
        return 1;
    }

    fabber_destroy(fab);
    printf("C API host test PASSED\n");
    return 0;
}
