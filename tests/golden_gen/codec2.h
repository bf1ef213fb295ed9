/* Stub of the codec2 public header, only so that the reference's shared
 * m17defines.h parses when compiling its freestanding L3 transform files
 * for golden-vector generation.  No codec2 functionality is used. */
#ifndef CODEC2_STUB_H
#define CODEC2_STUB_H
#define CODEC2_MODE_3200 0
struct CODEC2;
typedef struct CODEC2 CODEC2;
#ifdef __cplusplus
extern "C" {
#endif
struct CODEC2 *codec2_create(int mode);
void codec2_destroy(struct CODEC2 *c2);
void codec2_encode(struct CODEC2 *c2, unsigned char *bits, short *speech_in);
void codec2_decode(struct CODEC2 *c2, short *speech_out, const unsigned char *bits);
int codec2_samples_per_frame(struct CODEC2 *c2);
#ifdef __cplusplus
}
#endif
#endif
