// Reference hot-loop benchmark (BASELINE.md "build step 0").
// Compiles the reference's RX DSP chain (m17_dsp.cpp front end +
// m17_rx_sync.cpp polyphase timing) and Viterbi (m17_conv.cpp) from
// /root/reference and measures single-channel throughput on this
// machine.  Stubs below satisfy the radio/framer symbols the DSP calls.

#include <stdio.h>
#include <stdlib.h>
#include <math.h>
#include <time.h>
#include "m17defines.h"

// ---- stubs for symbols m17_dsp.cpp / m17_rx_sync.cpp call ----
static long long g_syms = 0;
void radio_afc(float mean) { (void)mean; }
float radio_get_afc_delta(void) { return 0.0f; }
bool radio_get_afc_status(void) { return false; }
void m17_rx_symbols(float *sym, int len) { (void)sym; g_syms += len; }
bool m17_rx_lock(void) { return false; }

static double now_s(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + ts.tv_nsec * 1e-9;
}

int main(void) {
    m17_dsp_init();
    m17_rx_sync_init();
    m17_init_conv();

    // ---- RX chain: 48 kHz IQ blocks through disc + timing recovery ----
    static scmplx block[N_SAMPLES];
    for (int i = 0; i < N_SAMPLES; i++) {
        double ph = 0.1 * i;
        block[i].re = (int16_t)(16000 * cos(ph));
        block[i].im = (int16_t)(16000 * sin(ph));
    }
    const int warm = 50, iters = 2000;
    for (int i = 0; i < warm; i++) m17_dsp_rx(block, N_SAMPLES);
    double t0 = now_s();
    for (int i = 0; i < iters; i++) m17_dsp_rx(block, N_SAMPLES);
    double dt = now_s() - t0;
    double samp_s = (double)iters * N_SAMPLES / dt;
    printf("rx_chain_samples_per_s %.0f\n", samp_s);

    // ---- Viterbi: stream-frame-sized decodes (296 soft bits) ----
    static float soft[296];
    srand(1);
    for (int i = 0; i < 296; i++) soft[i] = (rand() % 2 ? 1.f : -1.f);
    static uint8_t out[200];
    const int vwarm = 1000, viters = 200000;
    for (int i = 0; i < vwarm; i++) m17_viterbi_decode(soft, out, 296);
    t0 = now_s();
    for (int i = 0; i < viters; i++) m17_viterbi_decode(soft, out, 296);
    dt = now_s() - t0;
    printf("viterbi_stream_frames_per_s %.0f\n", (double)viters / dt);
    printf("viterbi_trellis_steps_per_s %.0f\n", (double)viters * 148 / dt);
    return 0;
}
