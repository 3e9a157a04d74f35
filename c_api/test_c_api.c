/* End-to-end C API test program (scripts/c_api_tests.sh analog). */
#include <assert.h>
#include <stdio.h>
#include "tfhe_c.h"

int main(void) {
    TfheClientKey *ck = NULL;
    TfheServerKey *sk = NULL;
    assert(tfhe_c_init() == 0);
    assert(tfhe_generate_keys(0, 77, &ck, &sk) == 0);
    assert(tfhe_set_server_key(sk) == 0);

    TfheFheUint8 *a = NULL, *b = NULL, *sum = NULL, *prod = NULL, *s = NULL;
    assert(tfhe_fheuint8_try_encrypt_with_client_key_u8(200, ck, &a) == 0);
    assert(tfhe_fheuint8_try_encrypt_with_client_key_u8(55, ck, &b) == 0);
    assert(tfhe_fheuint8_add(a, b, &sum) == 0);
    uint8_t v = 0;
    assert(tfhe_fheuint8_decrypt(sum, ck, &v) == 0);
    printf("200 + 55 = %u\n", v);
    assert(v == 255);
    assert(tfhe_fheuint8_mul(a, b, &prod) == 0);
    assert(tfhe_fheuint8_decrypt(prod, ck, &v) == 0);
    printf("200 * 55 mod 256 = %u\n", v);
    assert(v == (uint8_t)(200 * 55));
    assert(tfhe_fheuint8_scalar_add(a, 7, &s) == 0);
    assert(tfhe_fheuint8_decrypt(s, ck, &v) == 0);
    printf("200 + 7 = %u\n", v);
    assert(v == 207);

    tfhe_fheuint8_destroy(a);
    tfhe_fheuint8_destroy(b);
    tfhe_fheuint8_destroy(sum);
    tfhe_fheuint8_destroy(prod);
    tfhe_fheuint8_destroy(s);
    tfhe_client_key_destroy(ck);
    tfhe_server_key_destroy(sk);
    printf("c_api: ALL OK\n");
    return 0;
}
