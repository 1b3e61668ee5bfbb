// Golden-output generator: links the reference scalar kernel to produce test fixtures.
#include "bandedSWA.h"
#include <cstdio>
#include <cstdlib>
#include <cstring>
// reads: numPairs, then per pair: h0 len1 len2, ref digits, query digits
int main(int argc, char** argv) {
    FILE* f = fopen(argv[1], "r");
    int n; fscanf(f, "%d", &n);
    int8_t mat[25];
    int a=1,b=4,ambig=-1;
    if (argc > 2) { a=atoi(argv[2]); b=atoi(argv[3]); ambig=atoi(argv[4]); }
    int k=0;
    for (int i=0;i<4;i++){ for(int j=0;j<4;j++) mat[k++] = i==j?a:-b; mat[k++]=ambig; }
    for (int j=0;j<5;j++) mat[k++]=ambig;
    int o_del=6,e_del=1,o_ins=6,e_ins=1,zdrop=100,end_bonus=5,w=100;
    if (argc > 5) { o_del=atoi(argv[5]); e_del=atoi(argv[6]); o_ins=o_del; e_ins=e_del; }
    if (argc > 7) { zdrop=atoi(argv[7]); w=atoi(argv[8]); }
    BandedPairWiseSW bsw(o_del,e_del,o_ins,e_ins,zdrop,end_bonus,mat,a,b,1);
    for (int p=0;p<n;p++) {
        int h0,l1,l2; fscanf(f,"%d %d %d",&h0,&l1,&l2);
        char s1[4096], s2[4096];
        fscanf(f,"%s %s",s1,s2);
        uint8_t q1[4096], q2[4096];
        for(int i=0;i<l1;i++) q1[i]=s1[i]-'0';
        for(int i=0;i<l2;i++) q2[i]=s2[i]-'0';
        int qle,tle,gtle,gscore,max_off;
        int score = bsw.scalarBandedSWA(l2,q2,l1,q1,w,h0,&qle,&tle,&gtle,&gscore,&max_off);
        printf("%d %d %d %d %d %d\n",score,qle,tle,gtle,gscore,max_off);
    }
    return 0;
}
