// cdnet_tpu native host ops: fused batch assembly + augmentation.
//
// The reference feeds its GPU from 8 torch DataLoader worker processes
// (options.py:88, train.py:256-260) whose hot path is C inside
// PIL/albumentations. This library is the equivalent first-party native
// layer for the TPU loader: one call assembles a training batch — random
// crop, horizontal/vertical flip, brightness/contrast color jitter, uint8 ->
// float32 [0,1] conversion — fused into a single pass over each tile
// (one read + one write per pixel instead of one pass per transform), with a
// pthread pool across batch items.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: make -C native   ->  native/libcdnet_host.so

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <pthread.h>

namespace {

struct SampleTask {
    // inputs
    const uint8_t* img;      // (H, W, 3)
    const uint8_t* weight;   // (H, W)
    const int32_t* inst;     // (H, W)
    int h, w;
    // augmentation parameters (host RNG decides; C applies)
    int crop_y, crop_x, crop;   // crop origin + size
    int hflip, vflip;           // 0/1
    float brightness;           // multiplicative
    float contrast;             // (v - mean) * contrast + mean
    // outputs
    float* out_img;          // (crop, crop, 3) in [0,1]
    float* out_weight;       // (crop, crop)
    int32_t* out_inst;       // (crop, crop)
};

void process_sample(const SampleTask& t) {
    const int c = t.crop;
    // mean luminance of the crop for the contrast pivot (single pre-pass
    // over the crop region only)
    double mean = 0.0;
    for (int y = 0; y < c; ++y) {
        const uint8_t* row = t.img + ((t.crop_y + y) * t.w + t.crop_x) * 3;
        for (int x = 0; x < c * 3; ++x) mean += row[x];
    }
    mean /= (double)(c * c * 3) * 255.0;

    for (int y = 0; y < c; ++y) {
        const int sy = t.crop_y + (t.vflip ? (c - 1 - y) : y);
        for (int x = 0; x < c; ++x) {
            const int sx = t.crop_x + (t.hflip ? (c - 1 - x) : x);
            const uint8_t* p = t.img + (sy * t.w + sx) * 3;
            float* q = t.out_img + (y * c + x) * 3;
            for (int ch = 0; ch < 3; ++ch) {
                float v = (float)p[ch] / 255.0f * t.brightness;
                v = (v - (float)mean) * t.contrast + (float)mean;
                q[ch] = std::min(1.0f, std::max(0.0f, v));
            }
            t.out_weight[y * c + x] = (float)t.weight[sy * t.w + sx];
            t.out_inst[y * c + x] = t.inst[sy * t.w + sx];
        }
    }
}

struct Pool {
    const SampleTask* tasks;
    int n;
    int next;
    pthread_mutex_t mu;
};

void* worker(void* arg) {
    Pool* pool = (Pool*)arg;
    for (;;) {
        pthread_mutex_lock(&pool->mu);
        int i = pool->next++;
        pthread_mutex_unlock(&pool->mu);
        if (i >= pool->n) return nullptr;
        process_sample(pool->tasks[i]);
    }
}

}  // namespace

extern "C" {

// Assemble a batch of n samples. Per-sample parameter arrays are length n.
// imgs/weights/insts: pointers into per-sample source tiles (all h x w).
// Returns 0 on success.
int cdnet_assemble_batch(
    const uint8_t** imgs, const uint8_t** weights, const int32_t** insts,
    int n, int h, int w,
    const int* crop_y, const int* crop_x, int crop,
    const int* hflip, const int* vflip,
    const float* brightness, const float* contrast,
    float* out_imgs,      // (n, crop, crop, 3)
    float* out_weights,   // (n, crop, crop)
    int32_t* out_insts,   // (n, crop, crop)
    int n_threads) {
    if (n <= 0 || crop <= 0) return 1;
    SampleTask* tasks = new SampleTask[n];
    for (int i = 0; i < n; ++i) {
        tasks[i] = SampleTask{
            imgs[i], weights[i], insts[i], h, w,
            crop_y[i], crop_x[i], crop,
            hflip[i], vflip[i], brightness[i], contrast[i],
            out_imgs + (size_t)i * crop * crop * 3,
            out_weights + (size_t)i * crop * crop,
            out_insts + (size_t)i * crop * crop,
        };
        if (crop_y[i] < 0 || crop_y[i] + crop > h ||
            crop_x[i] < 0 || crop_x[i] + crop > w) {
            delete[] tasks;
            return 2;
        }
    }
    int nt = std::max(1, std::min(n_threads, n));
    Pool pool{tasks, n, 0, PTHREAD_MUTEX_INITIALIZER};
    pthread_t* threads = new pthread_t[nt];
    for (int i = 0; i < nt; ++i) pthread_create(&threads[i], nullptr, worker, &pool);
    for (int i = 0; i < nt; ++i) pthread_join(threads[i], nullptr);
    delete[] threads;
    delete[] tasks;
    return 0;
}

// Nearest-neighbor displacement warp of a (h, w) int32 label field plus a
// (h, w, 3) uint8 image and (h, w) uint8 weight map (elastic transform
// inner loop; the gaussian displacement field comes from the host RNG).
int cdnet_warp_nearest(
    const uint8_t* img, const uint8_t* weight, const int32_t* inst,
    int h, int w,
    const float* src_y, const float* src_x,   // (h, w) sample coordinates
    uint8_t* out_img, uint8_t* out_weight, int32_t* out_inst) {
    for (int y = 0; y < h; ++y) {
        for (int x = 0; x < w; ++x) {
            const int i = y * w + x;
            // floor-half-up: (int) truncation toward zero would map every
            // coord in (-1.5, -0.5) to 0 instead of out-of-bounds
            const int sy = (int)std::floor(src_y[i] + 0.5f);
            const int sx = (int)std::floor(src_x[i] + 0.5f);
            if (sy < 0 || sy >= h || sx < 0 || sx >= w) {
                out_img[i * 3] = out_img[i * 3 + 1] = out_img[i * 3 + 2] = 0;
                out_weight[i] = 0;
                out_inst[i] = 0;
            } else {
                const int j = sy * w + sx;
                out_img[i * 3] = img[j * 3];
                out_img[i * 3 + 1] = img[j * 3 + 1];
                out_img[i * 3 + 2] = img[j * 3 + 2];
                out_weight[i] = weight[j];
                out_inst[i] = inst[j];
            }
        }
    }
    return 0;
}

}  // extern "C"
