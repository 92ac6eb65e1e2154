/* Parallel .npy fbank batch loader.
 *
 * Native data-path component replacing the reference's DataLoader worker
 * processes (reference: src/ASRDataset.py:294): a pthread pool reads each
 * utterance's .npy payload straight into its [T, F] slice of a preallocated
 * float32 batch buffer, skipping Python per-file overhead entirely.
 *
 * Only the exact layout the preprocessing CLI writes is supported
 * (NPY v1.0/2.0, little-endian float32/float64, C-order, 2-D); anything else
 * returns a nonzero code for that row and the Python fallback handles it.
 *
 * C ABI:
 *   int load_fbank_batch(const char** paths, long n,
 *                        float* out, long t_pad, long feat,
 *                        const long* lens, long n_threads, long* status);
 */
#include <pthread.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    const char** paths;
    float* out;
    const long* lens;
    long* status;
    long n, t_pad, feat;
    long next; /* work index */
    pthread_mutex_t lock;
} Ctx;

/* returns 0 on success */
static int read_one(const char* path, float* dst, long t_len, long feat) {
    FILE* f = fopen(path, "rb");
    if (!f) return 1;
    unsigned char magic[8];
    if (fread(magic, 1, 8, f) != 8 || memcmp(magic, "\x93NUMPY", 6) != 0) {
        fclose(f);
        return 2;
    }
    int major = magic[6];
    uint32_t header_len = 0;
    if (major == 1) {
        unsigned char b[2];
        if (fread(b, 1, 2, f) != 2) { fclose(f); return 3; }
        header_len = b[0] | (b[1] << 8);
    } else {
        unsigned char b[4];
        if (fread(b, 1, 4, f) != 4) { fclose(f); return 3; }
        header_len = b[0] | (b[1] << 8) | ((uint32_t)b[2] << 16) | ((uint32_t)b[3] << 24);
    }
    char* header = (char*)malloc(header_len + 1);
    if (!header) { fclose(f); return 4; }
    if (fread(header, 1, header_len, f) != header_len) { free(header); fclose(f); return 3; }
    header[header_len] = 0;
    int is_f4 = strstr(header, "'<f4'") != NULL;
    int is_f8 = strstr(header, "'<f8'") != NULL;
    int fortran = strstr(header, "'fortran_order': True") != NULL;
    /* parse shape "(T, F)" */
    long rows = 0, cols = 0;
    char* sh = strstr(header, "'shape':");
    if (!sh || sscanf(sh, "'shape': (%ld, %ld)", &rows, &cols) != 2) {
        free(header);
        fclose(f);
        return 5;
    }
    free(header);
    if ((!is_f4 && !is_f8) || fortran || cols != feat) { fclose(f); return 6; }
    long want = t_len < rows ? t_len : rows;
    if (is_f4) {
        size_t got = fread(dst, sizeof(float), (size_t)(want * feat), f);
        fclose(f);
        return got == (size_t)(want * feat) ? 0 : 7;
    }
    /* float64 payload: convert */
    double* tmp = (double*)malloc((size_t)(want * feat) * sizeof(double));
    if (!tmp) { fclose(f); return 4; }
    size_t got = fread(tmp, sizeof(double), (size_t)(want * feat), f);
    fclose(f);
    if (got != (size_t)(want * feat)) { free(tmp); return 7; }
    for (long i = 0; i < want * feat; ++i) dst[i] = (float)tmp[i];
    free(tmp);
    return 0;
}

static void* worker(void* arg) {
    Ctx* c = (Ctx*)arg;
    for (;;) {
        pthread_mutex_lock(&c->lock);
        long i = c->next++;
        pthread_mutex_unlock(&c->lock);
        if (i >= c->n) break;
        float* dst = c->out + i * c->t_pad * c->feat;
        /* buffer is pre-zeroed by the caller; only the valid rows are read */
        c->status[i] = read_one(c->paths[i], dst, c->lens[i], c->feat);
    }
    return NULL;
}

int load_fbank_batch(const char** paths, long n, float* out, long t_pad,
                     long feat, const long* lens, long n_threads, long* status) {
    Ctx c = {paths, out, lens, status, n, t_pad, feat, 0, PTHREAD_MUTEX_INITIALIZER};
    if (n_threads > n) n_threads = n;
    if (n_threads < 1) n_threads = 1;
    pthread_t threads[64];
    if (n_threads > 64) n_threads = 64;
    for (long i = 0; i < n_threads; ++i) pthread_create(&threads[i], NULL, worker, &c);
    for (long i = 0; i < n_threads; ++i) pthread_join(threads[i], NULL);
    int rc = 0;
    for (long i = 0; i < n; ++i)
        if (status[i] != 0) rc = 1;
    return rc;
}
