/* C API for the tfhe_tpu framework (analog of tfhe/src/c_api/: opaque
 * handles + create/op/destroy functions).  The compute core runs in an
 * embedded Python/JAX runtime; handles are reference-counted core objects.
 *
 * Every function returns 0 on success, nonzero on error (matching the
 * reference's c_api error convention).  Call tfhe_c_init() once before any
 * other function and tfhe_c_deinit() at shutdown. */
#ifndef TFHE_TPU_C_H
#define TFHE_TPU_C_H

#include <stdint.h>
#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct TfheClientKey TfheClientKey;
typedef struct TfheServerKey TfheServerKey;
typedef struct TfheFheUint8 TfheFheUint8;

int tfhe_c_init(void);
int tfhe_c_deinit(void);

/* config_kind: 0 = fast insecure test parameters, 1 = production 2_2 */
int tfhe_generate_keys(int config_kind, uint64_t seed,
                       TfheClientKey **client_key, TfheServerKey **server_key);
int tfhe_set_server_key(TfheServerKey *server_key);

int tfhe_client_key_destroy(TfheClientKey *key);
int tfhe_server_key_destroy(TfheServerKey *key);

int tfhe_fheuint8_try_encrypt_with_client_key_u8(uint8_t value,
                                                 TfheClientKey *key,
                                                 TfheFheUint8 **out);
int tfhe_fheuint8_decrypt(TfheFheUint8 *ct, TfheClientKey *key, uint8_t *out);
int tfhe_fheuint8_destroy(TfheFheUint8 *ct);

int tfhe_fheuint8_add(TfheFheUint8 *lhs, TfheFheUint8 *rhs, TfheFheUint8 **out);
int tfhe_fheuint8_sub(TfheFheUint8 *lhs, TfheFheUint8 *rhs, TfheFheUint8 **out);
int tfhe_fheuint8_mul(TfheFheUint8 *lhs, TfheFheUint8 *rhs, TfheFheUint8 **out);
int tfhe_fheuint8_bitand(TfheFheUint8 *lhs, TfheFheUint8 *rhs, TfheFheUint8 **out);
int tfhe_fheuint8_scalar_add(TfheFheUint8 *lhs, uint8_t rhs, TfheFheUint8 **out);
int tfhe_fheuint8_eq(TfheFheUint8 *lhs, TfheFheUint8 *rhs, TfheFheUint8 **out_bool);

#ifdef __cplusplus
}
#endif
#endif /* TFHE_TPU_C_H */
